#!/bin/bash
# Round-5 field-kernel last-mile knob sweep (VERDICT r4 weak-#3 residual):
# re-sweep step_pack / tile_rays / march_loop at the CURRENT stock defaults
# (native-argmin geo tile 512 + gamma-folded single-stage synthesis) — the
# round-4 optimum was found under different surrounding stages, so the
# field knob optimum may have shifted.  End-to-end bench.py, inference only.
set -x
cd /root/repo
export BENCH_TRAIN=0

run() { # label, then env assignments as remaining args
  local label="$1"; shift
  env "$@" timeout 1800 python -u bench.py 2>&1 | grep -E '^\{' | sed "s/^/[$label] /"
}

run "defaults(fold,sp2,t64)"
run "sp4"           BENCH_STEP_PACK=4
run "sp8"           BENCH_STEP_PACK=8
run "sp4 t32"       BENCH_STEP_PACK=4 BENCH_TILE_RAYS=32
run "sp8 t32"       BENCH_STEP_PACK=8 BENCH_TILE_RAYS=32
run "t128 loop unfolded" BENCH_TILE_RAYS=128 BENCH_MARCH_LOOP=1 BENCH_FOLD_FILM=0
run "sp2 t32"       BENCH_TILE_RAYS=32
run "sp2 t128 folded" BENCH_TILE_RAYS=128
echo "=== field sweep done ==="
