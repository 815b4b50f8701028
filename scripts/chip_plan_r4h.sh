#!/bin/bash
# Round-4 queue, leg H (fresh VM session; caches wiped by the restart,
# r4g never ran). Highest value first:
#  K3. 1M x 128 M=32 pool=500 (efc=500 parity point) scored against the
#      FIXED exact GT — the existing ladder rows (0.9277-0.9294) were
#      capped by the corrupted device GT (TPU_NOTES r4 "ROOT CAUSE").
#  L.  bench --gate — fresh floors + repopulates .jax_cache so the
#      driver's end-of-round bench.py runs warm.
#  K1. 1M M=32 pool=default (ladder contrast vs K3, exact GT).
#  J.  16.78M x M=32 bf16 graph (VERDICT #2 chip leg) — long; runs last
#      so an early kill costs only the stretch goal.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4h.log
exec >>"$LOG" 2>&1

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4h] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4h] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4h] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r4h] $(date) stage K3: 1M M=32 pool=500 (exact GT)"
SHINE_1M_M=32 SHINE_1M_EFC=500 timeout 4200 python scripts/scale_1m_hnsw.py \
  || echo "[r4h] stage K3 failed (non-fatal)"
echo "[r4h] cooling 120s"; sleep 120; wait_tunnel

echo "[r4h] $(date) stage L: bench --gate"
timeout 3600 python bench.py --gate \
  || echo "[r4h] stage L rc=$? (non-fatal)"
echo "[r4h] cooling 120s"; sleep 120; wait_tunnel

echo "[r4h] $(date) stage K1: 1M M=32 pool=default (exact GT)"
SHINE_1M_M=32 timeout 3000 python scripts/scale_1m_hnsw.py \
  || echo "[r4h] stage K1 failed (non-fatal)"
echo "[r4h] cooling 180s"; sleep 180; wait_tunnel

echo "[r4h] $(date) stage J: 16.78M x M=32 bf16 graph (long)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  timeout 18000 python scripts/scale_10m_hnsw.py \
  || echo "[r4h] stage J failed (non-fatal)"

echo "[r4h] $(date) DONE"
