#!/bin/bash
# Round-5 queue, leg A — lands the VERDICT-r4 top items in risk order:
#  A. 1M M=32 pool=500 through the NEW fused device sweep+select
#     pipeline (base_dev path) — validates the refactor against the r4h
#     host-path certification (0.9866@ef64 / 0.9941@ef96 / 0.9969@ef128)
#     before burning hours at 16.78M. Also emits the new gt_overlap
#     column.
#  B. 16.78M M=32 pool=0 bf16 graph (VERDICT #1, 4th attempt — now
#     int8-sweep plan-driven, 13.0 GB planned vs the 15.1+ that OOM'd).
#  C. 10.5M M=32 pool=500 (VERDICT #2: efc=500 at 10M with no (n, pool)
#     host table — fused device select; plan picks bf16-split).
#  D. bench --gate (repopulates the wiped .jax_cache for the driver's
#     end-of-round run; floors check).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5a.log
exec >>"$LOG" 2>&1

probe() {
  # 900s: a fresh VM's FIRST axon matmul pays a cold compile that can
  # exceed the old 300s cap under compile-service load (this leg's 09:59
  # launch burned 5 probe rounds on it); the persistent cache makes
  # every later probe instant
  timeout 900 python - <<'PY'
import sys, time
sys.path.insert(0, ".")
from shine_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r5a] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5a] matmul sanity ok {float(y[0,0])} after {time.time()-t0:.0f}s",
      flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r5a] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5a] $(date) stage A: 1M M=32 pool=500 via fused device pipeline"
SHINE_10MH_N=1048576 SHINE_10MH_M=32 SHINE_10MH_EFC=500 \
  SHINE_10MH_ROWS=f32 timeout 5400 python scripts/scale_10m_hnsw.py \
  || echo "[r5a] stage A failed (non-fatal)"
echo "[r5a] cooling 180s"; sleep 180; wait_tunnel

echo "[r5a] $(date) stage B: 16.78M M=32 pool=0 bf16 graph (VERDICT #1)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  SHINE_GT_NEVAL=128 timeout 21600 python scripts/scale_10m_hnsw.py \
  || echo "[r5a] stage B failed (non-fatal)"
echo "[r5a] cooling 300s"; sleep 300; wait_tunnel

echo "[r5a] $(date) stage C: 10.5M M=32 pool=500 (VERDICT #2)"
SHINE_10MH_N=10485760 SHINE_10MH_M=32 SHINE_10MH_EFC=500 \
  SHINE_10MH_ROWS=bf16 SHINE_GT_NEVAL=128 \
  timeout 18000 python scripts/scale_10m_hnsw.py \
  || echo "[r5a] stage C failed (non-fatal)"
echo "[r5a] cooling 300s"; sleep 300; wait_tunnel

echo "[r5a] $(date) stage D: bench --gate"
timeout 5400 python bench.py --gate \
  || echo "[r5a] stage D rc=$? (non-fatal)"

echo "[r5a] $(date) DONE"
