#!/bin/bash
# Round-5 leg I (waits for r5h = B3 16.78M serve + bench gate):
#  C2. 10.5M M=32 pool=500 retry (the first attempt wedged mid-level-0
#      on tunnel drop #3; gen/base/crosscheck all cached now).
#  E.  profile_hnsw 1M (VERDICT #4) — 1M efc500 ckpt already cached.
#  F.  skew x shared-tile budget 4.19M (VERDICT #9 chip leg).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5i.log
exec >>"$LOG" 2>&1

WAIT_PID="$(cat /tmp/r5e.pid 2>/dev/null || echo 0)"
echo "[r5i] $(date) waiting for r5h (pid $WAIT_PID)"
while kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 180
done
echo "[r5i] $(date) r5h done; cooling 300s"
sleep 300

probe() {
  timeout 900 python - <<'PY'
import sys, time
sys.path.insert(0, ".")
from shine_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r5i] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5i] matmul ok after {time.time()-t0:.0f}s", flush=True)
PY
}
wait_tunnel() {
  until probe; do
    echo "[r5i] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5i] $(date) stage B4: 16.78M deep-ef serve (192,256)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  SHINE_GT_NEVAL=128 SHINE_10MH_EFS=192,256 \
  timeout 7200 python scripts/scale_10m_hnsw.py \
  || echo "[r5i] stage B4 failed (non-fatal)"
echo "[r5i] cooling 300s"; sleep 300; wait_tunnel

echo "[r5i] $(date) stage C2: 10.5M M=32 pool=500 retry"
SHINE_10MH_N=10485760 SHINE_10MH_M=32 SHINE_10MH_EFC=500 \
  SHINE_10MH_ROWS=bf16 SHINE_GT_NEVAL=128 \
  timeout 14400 python scripts/scale_10m_hnsw.py \
  || echo "[r5i] stage C2 failed (non-fatal)"
echo "[r5i] cooling 300s"; sleep 300; wait_tunnel

echo "[r5i] $(date) stage E: profile_hnsw 1M (VERDICT #4)"
timeout 7200 python scripts/profile_hnsw.py \
  || echo "[r5i] stage E failed (non-fatal)"
echo "[r5i] cooling 180s"; sleep 180; wait_tunnel

echo "[r5i] $(date) stage F: skew x budget 4.19M (VERDICT #9)"
SHINE_SKC_SHARED=4,8,12,16 timeout 7200 python scripts/exp_skew_capacity.py \
  || echo "[r5i] stage F failed (non-fatal)"

echo "[r5i] $(date) DONE"
