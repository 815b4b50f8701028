#!/bin/bash
# Round-5 queue, leg C (fresh VM after the restart that killed r5a
# mid-queue; caches wiped). Re-runs the un-landed stages in risk order:
#  B. 16.78M M=32 pool=0 bf16 graph (VERDICT #1, 4th attempt — the
#     plan-driven int8 sweep layout was chip-validated at 1M in r5a
#     stage A before the VM died).
#  C. 10.5M M=32 pool=500 (VERDICT #2: efc=500 at 10M, fused device
#     select — no (n, pool) host table).
#  D. bench --gate (floors + repopulates the wiped .jax_cache for the
#     driver's end-of-round run).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5e.log
exec >>"$LOG" 2>&1

probe() {
  # 900s: a fresh VM's FIRST axon matmul pays a cold compile that can
  # exceed 300s under compile-service load (measured 458s in r5a).
  timeout 900 python - <<'PY'
import sys, time
sys.path.insert(0, ".")
from shine_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r5e] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5e] matmul sanity ok {float(y[0,0])} after {time.time()-t0:.0f}s",
      flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r5e] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5e] $(date) stage B: 16.78M M=32 pool=0 bf16 graph (VERDICT #1)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  SHINE_GT_NEVAL=128 timeout 21600 python scripts/scale_10m_hnsw.py \
  || echo "[r5e] stage B failed (non-fatal)"
echo "[r5e] cooling 300s"; sleep 300; wait_tunnel

echo "[r5e] $(date) stage C: 10.5M M=32 pool=500 (VERDICT #2)"
SHINE_10MH_N=10485760 SHINE_10MH_M=32 SHINE_10MH_EFC=500 \
  SHINE_10MH_ROWS=bf16 SHINE_GT_NEVAL=128 \
  timeout 18000 python scripts/scale_10m_hnsw.py \
  || echo "[r5e] stage C failed (non-fatal)"
echo "[r5e] cooling 300s"; sleep 300; wait_tunnel

echo "[r5e] $(date) stage D: bench --gate"
timeout 5400 python bench.py --gate \
  || echo "[r5e] stage D rc=$? (non-fatal)"

echo "[r5e] $(date) DONE"
