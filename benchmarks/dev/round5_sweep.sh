#!/bin/bash
# Round-5 measurement sweep (VERDICT r4 #2/#3): flagship-512 training
# compile+measure and batch-scaling on both benches.  Sequential — one
# chip, one program at a time.
set -x
cd /root/repo

echo "=== bench_train MAP3DBN batch sweep ==="
for B in 8 16 32; do
  timeout 2400 python -u benchmarks/bench_train.py --config MAP3DBN --batch $B 2>&1 | grep -E '^\{' | sed "s/^/[train MAP3DBN b$B] /"
done

echo "=== bench_train 512 configs (flagship) ==="
timeout 3000 python -u benchmarks/bench_train.py --config MAP3DBN512 --batch 8 2>&1 | grep -E '^\{' | sed 's/^/[train MAP3DBN512 b8] /'
timeout 3000 python -u benchmarks/bench_train.py --config MAP3DBN512L --batch 8 2>&1 | grep -E '^\{' | sed 's/^/[train MAP3DBN512L b8] /'

echo "=== bench.py (inference) batch sweep ==="
for B in 8 16 32; do
  BENCH_TRAIN=0 BENCH_BATCH=$B timeout 2400 python -u bench.py 2>&1 | grep -E '^\{' | sed "s/^/[gen 512L b$B] /"
done
echo "=== sweep done ==="
