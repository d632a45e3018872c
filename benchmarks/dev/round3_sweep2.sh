#!/bin/bash
# Round-3 follow-up sweep: vmem-fitting march_loop tile (96), batch-size
# scaling (per-image throughput at batch 16/32), and best-knob combos.
set -u
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/round3_sweep2.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)] env: ${ENVDESC:-}" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | grep -v Warning | tail -6 | tee -a "$LOG"
}

ENVDESC="tile96 loop" BENCH_TILE_RAYS=96 BENCH_MARCH_LOOP=1 run python bench.py
ENVDESC="batch16" BENCH_BATCH=16 run python bench.py
ENVDESC="batch32" BENCH_BATCH=32 run python bench.py
ENVDESC="batch16 tile96 loop" BENCH_BATCH=16 BENCH_TILE_RAYS=96 BENCH_MARCH_LOOP=1 run python bench.py
echo "=== sweep2 done [$(date +%H:%M:%S)]" | tee -a "$LOG"
