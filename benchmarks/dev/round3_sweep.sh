#!/bin/bash
# Round-3 TPU measurement session: headline bench, kernel-knob sweeps,
# per-stage roofline, training-path A/B.  Run from the repo root on a
# machine with the TPU tunnel up; ~40-60 min total (first compiles).
# Results append to /tmp/round3_sweep.log — PERFORMANCE.md is written
# from that log.
set -u
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/round3_sweep.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | grep -v Warning | tail -20 | tee -a "$LOG"
}

# 1. headline at defaults
run python bench.py

# 2. inference kernel knobs
BENCH_TILE_RAYS=128 BENCH_MARCH_LOOP=1 run python bench.py
BENCH_TILE_RAYS=64  BENCH_MARCH_LOOP=1 run python bench.py
BENCH_SYNTH_TILE=1 run python bench.py
BENCH_SYNTH_TILE=4 run python bench.py

# 3. per-stage roofline (defaults, then march_loop best)
run python benchmarks/dev/prof_roofline.py
BENCH_TILE_RAYS=128 BENCH_MARCH_LOOP=1 run python benchmarks/dev/prof_roofline.py

# 4. training path
run python benchmarks/bench_train.py
BENCH_SYNTH_TRAIN=0 run python benchmarks/bench_train.py
BENCH_SYNTH_TRAIN_TILE=4  run python benchmarks/bench_train.py
BENCH_SYNTH_TRAIN_TILE=16 run python benchmarks/bench_train.py

echo "=== sweep done [$(date +%H:%M:%S)]" | tee -a "$LOG"
