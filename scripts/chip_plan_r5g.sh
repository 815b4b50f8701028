#!/bin/bash
# Round-5 queue, leg G: stage-B RESUME after the tunnel dropped mid-
# level-1 (level 0 of the 16.78M build is checkpointed: 4.36 GB
# stage0.npz; base cached on disk) -> stage C -> bench gate.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5g.log
exec >>"$LOG" 2>&1

probe() {
  timeout 900 python - <<'PY'
import sys, time
sys.path.insert(0, ".")
from shine_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r5g] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5g] matmul sanity ok {float(y[0,0])} after {time.time()-t0:.0f}s",
      flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r5g] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5g] $(date) stage B2: 16.78M M=32 RESUME from stage0 ckpt"
SHINE_10MH_RESUME=1 SHINE_10MH_N=16777216 SHINE_10MH_M=32 \
  SHINE_10MH_ROWS=bf16 SHINE_GT_NEVAL=128 \
  timeout 14400 python scripts/scale_10m_hnsw.py \
  || echo "[r5g] stage B2 failed (non-fatal)"
echo "[r5g] cooling 300s"; sleep 300; wait_tunnel

echo "[r5g] $(date) stage C: 10.5M M=32 pool=500 (VERDICT #2)"
SHINE_10MH_N=10485760 SHINE_10MH_M=32 SHINE_10MH_EFC=500 \
  SHINE_10MH_ROWS=bf16 SHINE_GT_NEVAL=128 \
  timeout 14400 python scripts/scale_10m_hnsw.py \
  || echo "[r5g] stage C failed (non-fatal)"
echo "[r5g] cooling 300s"; sleep 300; wait_tunnel

echo "[r5g] $(date) stage D: bench --gate"
timeout 5400 python bench.py --gate \
  || echo "[r5g] stage D rc=$? (non-fatal)"

echo "[r5g] $(date) DONE"
