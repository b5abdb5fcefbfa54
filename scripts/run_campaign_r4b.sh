#!/bin/bash
# Round-4 follow-up: one 1-vs-4 pair at ~5M pages (the third thread pair
# at the largest input), fresh JVM per leg, ceilings bracketed.
set -e
cd "$(dirname "$0")/.."
echo "=== 1->4 pair at 5.04M pages $(date -u +%H:%M:%S) ==="
scripts/scaling_pair.sh 1 4 560000
echo "=== done $(date -u +%H:%M:%S) ==="
