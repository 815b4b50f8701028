#!/bin/bash
# Round-4 queue, sixth leg (host restart killed r4d/r4e before they ran;
# r4c died mid-grid after confirming tq=512/tn=2048 is already the best
# fscan tiling). Reordered by value for the remaining wall-clock:
#  I. diag_1m_recall chip leg — confirm the GT precision fix
#     (models/flat.py flat_search precision=HIGHEST) on chip: numpy GT
#     crosscheck + search() config ablation.
#  K. 1M x 128 M=32 efc ladder rerun (pool default/200/500) with exact
#     GT — the r4b readings were capped at the corrupted scorer's 0.9296.
#  L. bench --gate (fresh headline + floors for the round).
#  J. 16.78M x M=32 graph (the 100M-class per-shard unit) — longest leg
#     last; partial rows still land in results/scale_10m_hnsw.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4f.log
exec >>"$LOG" 2>&1

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4f] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4f] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4f] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r4f] $(date) stage I: 1M recall diagnostic (GT crosscheck + ablation, post-fix)"
timeout 3600 python scripts/diag_1m_recall.py \
  || echo "[r4f] stage I failed (non-fatal)"
echo "[r4f] cooling 120s"; sleep 120; wait_tunnel

echo "[r4f] $(date) stage K: 1M M=32 efc ladder rerun (exact GT)"
SHINE_1M_M=32 timeout 5400 python scripts/scale_1m_hnsw.py \
  || echo "[r4f] stage K1 failed (non-fatal)"
echo "[r4f] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=200 timeout 7200 python scripts/scale_1m_hnsw.py \
  || echo "[r4f] stage K2 failed (non-fatal)"
echo "[r4f] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=500 timeout 9000 python scripts/scale_1m_hnsw.py \
  || echo "[r4f] stage K3 failed (non-fatal)"
echo "[r4f] cooling 180s"; sleep 180; wait_tunnel

echo "[r4f] $(date) stage L: bench --gate"
timeout 3600 python bench.py --gate \
  || echo "[r4f] stage L failed rc=$? (non-fatal)"
echo "[r4f] cooling 180s"; sleep 180; wait_tunnel

echo "[r4f] $(date) stage J: 16.78M x M=32 graph (self-sweep arg fix)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  timeout 18000 python scripts/scale_10m_hnsw.py \
  || echo "[r4f] stage J failed (non-fatal)"

echo "[r4f] $(date) DONE"
