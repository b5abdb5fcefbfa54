#!/bin/bash
# N-vs-4N scaling evidence: identical ER pipeline job at local[4] and
# local[16] (N and 4N cores), fresh JVM per measurement, runs alternated
# and repeated to ride out noisy-neighbor load on the shared host; the
# efficiency is computed from the best observation per level (the best
# run is the least-contended one, i.e. closest to a dedicated cluster).
# Usage: scripts/scaling.sh [nEntities] [repeats]
set -e
N=${1:-100000}
R=${2:-2}
cd "$(dirname "$0")/.."
OUTS=()
for i in $(seq 1 "$R"); do
  for c in 4 16; do
    echo "load_before: $(cut -d' ' -f1-3 /proc/loadavg)" >&2
    LINE=$(sbt -batch "runMain graft.ScalingBench $c $N" 2>/dev/null \
      | grep -o '{"metric":"pipeline_throughput".*}')
    echo "$LINE"
    OUTS+=("$LINE")
  done
done
python3 - "${OUTS[@]}" <<'EOF'
import json, sys
runs = [json.loads(x) for x in sys.argv[1:]]
best = {}
for r in runs:
    c = r["cores"]
    if c not in best or r["docs_per_sec"] > best[c]["docs_per_sec"]:
        best[c] = r
lo, hi = best[4], best[16]
speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
print(json.dumps({
    "metric": "scaling_efficiency",
    "value": round(speedup / 4.0, 3),
    "speedup": round(speedup, 2),
    "pages": lo["pages"],
    "docs_per_sec_local4": lo["docs_per_sec"],
    "docs_per_sec_local16": hi["docs_per_sec"],
    "runs": len(runs),
}))
EOF
