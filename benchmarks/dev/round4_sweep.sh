#!/bin/bash
# Round-4 TPU measurement session: headline bench + field-kernel knob sweep
# (step_pack now the primary lever), per-stage roofline, and the training
# path at STOCK defaults (auto VMEM tiling).  Results append to
# /tmp/round4_sweep.log; PERFORMANCE.md is written from that log.
set -u
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/round4_sweep.log}
run() {
  echo "=== ${ENVDESC:-} $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | grep -vE "WARN|INFO|^\[" | tail -8 | tee -a "$LOG"
}

# 1. headline at defaults (step_pack 2)
ENVDESC="defaults" run python bench.py

# 2. step_pack sweep (MXU row occupancy: M = step_pack * tile_rays)
ENVDESC="sp4"        BENCH_STEP_PACK=4 run python bench.py
ENVDESC="sp8"        BENCH_STEP_PACK=8 run python bench.py
ENVDESC="sp4 tile32" BENCH_STEP_PACK=4 BENCH_TILE_RAYS=32 run python bench.py
ENVDESC="sp8 tile32" BENCH_STEP_PACK=8 BENCH_TILE_RAYS=32 run python bench.py
ENVDESC="sp16 tile32" BENCH_STEP_PACK=16 BENCH_TILE_RAYS=32 run python bench.py

# 3. per-stage roofline at the best knobs found above (edit env here)
ENVDESC="roofline" run python benchmarks/dev/prof_roofline.py

# 4. batch scaling at best knobs
ENVDESC="batch16" BENCH_BATCH=16 run python bench.py

# 5. training at STOCK defaults (auto VMEM tiling — the round-4 fix)
ENVDESC="train stock" run python benchmarks/bench_train.py

# 6. synthesis stage-count sweep (fewer stage boundaries = fewer bf16
#    HBM round-trips of the (B, H, W, 420) carry)
ENVDESC="bps5"       BENCH_SYNTH_BPS=5 run python bench.py
ENVDESC="bps3"       BENCH_SYNTH_BPS=3 run python bench.py
ENVDESC="bps5 tile4" BENCH_SYNTH_BPS=5 BENCH_SYNTH_TILE=4 run python bench.py
ENVDESC="bps9"       BENCH_SYNTH_BPS=9 run python bench.py

echo "=== sweep done [$(date +%H:%M:%S)]" | tee -a "$LOG"
