#!/bin/bash
# Final scaling evidence: pipeline throughput at local[2] vs local[8]
# (N and 4N cores) bracketed by a pure-CPU hardware-ceiling probe — on
# this shared host, 4x the threads does NOT provide 4x the resources, so
# both the raw efficiency and the ceiling-normalized efficiency are
# reported. Usage: scripts/scaling_with_ceiling.sh [nEntities]
set -e
N=${1:-60000}
cd "$(dirname "$0")/.."
ceiling() {
python3 - <<'EOF'
import time, multiprocessing as mp, json
def burn(q):
    t0=time.time(); x=0
    for i in range(20_000_000): x+=i*i
    q.put(0)
out={}
for n in (2, 8):
    best=None
    for _ in range(2):
        q=mp.Queue(); ps=[mp.Process(target=burn,args=(q,)) for _ in range(n)]
        t0=time.time(); [p.start() for p in ps]; [p.join() for p in ps]
        w=time.time()-t0
        best=w if best is None or w<best else best
    out[n]=n/best
print(json.dumps({"cpu_ceiling_speedup_2to8": round(out[8]/out[2],2)}))
EOF
}
echo "loadavg: $(cut -d' ' -f1-3 /proc/loadavg)"
C1=$(ceiling); echo "$C1"
T2=$(sbt -batch "runMain graft.ScalingBench 2 $N" 2>/dev/null | grep -o '{"metric":"pipeline_throughput.*}')
echo "$T2"
T8=$(sbt -batch "runMain graft.ScalingBench 8 $N" 2>/dev/null | grep -o '{"metric":"pipeline_throughput.*}')
echo "$T8"
C2=$(ceiling); echo "$C2"
python3 - "$T2" "$T8" "$C1" "$C2" <<'EOF'
import json, sys
t2, t8, c1, c2 = [json.loads(x) for x in sys.argv[1:]]
speedup = t8["docs_per_sec"] / t2["docs_per_sec"]
ceiling = (c1["cpu_ceiling_speedup_2to8"] + c2["cpu_ceiling_speedup_2to8"]) / 2
print(json.dumps({
    "metric": "scaling_efficiency",
    "raw_speedup_2to8": round(speedup, 2),
    "raw_efficiency": round(speedup / 4.0, 3),
    "host_cpu_ceiling_speedup_2to8": round(ceiling, 2),
    "ceiling_normalized_efficiency": round(speedup / ceiling, 3),
    "pages": t2["pages"],
    "docs_per_sec_local2": t2["docs_per_sec"],
    "docs_per_sec_local8": t8["docs_per_sec"],
}))
EOF
