#!/bin/bash
# Round-4 scaling campaign: two interleaved 2-vs-8 pairs at ~5M pages
# (nEntities=560000 x 9 pages/entity), fresh JVM per leg, ceilings
# bracketed per pair (scripts/scaling_pair.sh). All legs disclosed.
set -e
cd "$(dirname "$0")/.."
echo "=== campaign A $(date -u +%H:%M:%S) ==="
scripts/scaling_pair.sh 2 8 560000
echo "=== campaign B $(date -u +%H:%M:%S) ==="
scripts/scaling_pair.sh 2 8 560000
echo "=== done $(date -u +%H:%M:%S) ==="
