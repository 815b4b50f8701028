#!/bin/bash
# Graph-family cache-BUDGET x skew sweep on the 8-dev CPU mesh
# (VERDICT r4 #9: the reference's 2-25% cache-size axis,
# exp_cache_size_and_skew.py:8-13, on the sharded-HNSW hot replica).
# Niced: shares the 1-core host with the chip queue's host stages.
set -u
cd "$(dirname "$0")/.."
LOG=results/skew_budget_cpu.log
exec >>"$LOG" 2>&1

# wait for the sharded_build_identity CPU run to release the single core
while ps -eo args | grep -q "[s]harded_build_identity.py"; do
  sleep 120
done
echo "[skewb] $(date) start"
rm -f results/skew_budget.jsonl
nice -n 19 python scripts/exp_sweep.py --out results/skew_budget.jsonl \
  --label skew_budget --synthetic 131072:64 --index hnsw \
  --shards 8 --cpu-mesh 8 --ef-search 64 --num-queries 2048 \
  --zipf 0 0.75 1.25 --cache-ratio 0 0.02 0.05 0.10 0.15 0.25 \
  --index-cache .bench_cache/skewb_hnsw_131072x64.npz \
  --extra --fast-build \
  || echo "[skewb] sweep rc=$?"
nice -n 19 python scripts/collect_results.py results/skew_budget.jsonl \
  --out results/skew_budget.csv || echo "[skewb] collect rc=$?"
echo "[skewb] $(date) done"
