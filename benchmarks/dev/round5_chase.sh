#!/bin/bash
# Round-5 chase: repro the two silent sweep failures WITH stderr
# (MAP3DBN512L b8 and MAP3DBN b32 full train steps), try batch_split
# micro-batching as the fallback, then run the field-kernel knob sweep.
cd /root/repo

run_train() { # label, then bench_train args
  local label="$1"; shift
  local log="/tmp/r5b_${label// /_}.log"
  echo "=== $label (full log: $log) ==="
  timeout 3600 python -u benchmarks/bench_train.py "$@" >"$log" 2>&1
  echo "[exit $?]"
  tail -25 "$log" | sed "s/^/[$label] /"
}

run_train "512L_b8_stock"  --config MAP3DBN512L --batch 8
run_train "512L_b8_split2" --config MAP3DBN512L --batch 8 --batch_split 2
run_train "b32_stock"      --config MAP3DBN --batch 32
run_train "b32_split4"     --config MAP3DBN --batch 32 --batch_split 4
echo "=== chase done, starting field sweep ==="
bash benchmarks/dev/round5_field_sweep.sh
echo "=== round5_chase chain done ==="
