#!/bin/bash
# N-vs-4N scaling evidence: identical job, local[8] then local[32], fresh
# JVM each. Prints both throughputs and the efficiency (speedup / 4).
set -e
N=${1:-60000}
cd "$(dirname "$0")/.."
OUT8=$(sbt -batch "runMain graft.ScalingBench 8 $N" 2>/dev/null | grep -o '{"metric":"pipeline_throughput".*}')
OUT32=$(sbt -batch "runMain graft.ScalingBench 32 $N" 2>/dev/null | grep -o '{"metric":"pipeline_throughput".*}')
echo "$OUT8"
echo "$OUT32"
python3 - "$OUT8" "$OUT32" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
speedup = b["docs_per_sec"] / a["docs_per_sec"]
print(json.dumps({
    "metric": "scaling_efficiency",
    "value": round(speedup / 4.0, 3),
    "speedup": round(speedup, 2),
    "pages": a["pages"],
    "docs_per_sec_local8": a["docs_per_sec"],
    "docs_per_sec_local32": b["docs_per_sec"],
}))
EOF
