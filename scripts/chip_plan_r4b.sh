#!/bin/bash
# Round-4 queue, second leg (r4a stage A — the 100M routed >=0.95 sweep —
# completed; stages B/C crashed on two compile OOMs fixed in-tree:
# jit-fused row norms + fused-keep2 kb<=32 gate).
#   C  1M M=32 efc ladder: default pool vs 200 vs 500 (VERDICT #2 efc
#      parity; short runs — validates the keep2 gate on chip first)
#   B  16.78M x M=32 graph build + bf16 serving (VERDICT #1: the
#      100M-class per-shard unit; 8 x 16.78M = 134M)
#   D  skew x probe-budget ablation at 4.19M (VERDICT #5)
#   E  bench --gate (floors validation on chip)
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4b.log
exec >>"$LOG" 2>&1

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4b] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4b] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4b] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

START=$(date +%s)
echo "[r4b] $(date) queue start"
wait_tunnel

echo "[r4b] $(date) stage C: 1M M=32 efc ladder (pool default/200/500)"
SHINE_1M_M=32 timeout 5400 python scripts/scale_1m_hnsw.py \
  || echo "[r4b] stage C1 failed (non-fatal)"
echo "[r4b] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=200 timeout 7200 python scripts/scale_1m_hnsw.py \
  || echo "[r4b] stage C2 failed (non-fatal)"
echo "[r4b] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=500 timeout 9000 python scripts/scale_1m_hnsw.py \
  || echo "[r4b] stage C3 failed (non-fatal)"
echo "[r4b] cooling 180s"; sleep 180; wait_tunnel

echo "[r4b] $(date) stage B: 16.78M x M=32 graph build + bf16 serving"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  timeout 14400 python scripts/scale_10m_hnsw.py \
  || echo "[r4b] stage B failed (non-fatal)"
echo "[r4b] cooling 180s"; sleep 180; wait_tunnel

echo "[r4b] $(date) stage D: skew x probe ablation at 4.19M"
timeout 5400 python scripts/exp_skew_capacity.py \
  || echo "[r4b] stage D failed (non-fatal)"
echo "[r4b] cooling 120s"; sleep 120; wait_tunnel

echo "[r4b] $(date) stage E: bench --gate"
timeout 3600 python bench.py --gate || echo "[r4b] gate rc=$?"

ELAPSED=$(( $(date +%s) - START ))
echo "[r4b] $(date) DONE (elapsed ${ELAPSED}s)"
