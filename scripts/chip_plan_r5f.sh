#!/bin/bash
# Round-5 queue, leg D (waits for r5e; the r5b leg never ran — its VM
# died while waiting on r5a):
#  E. profile_hnsw at 1M — graph-dispatch stage decomposition
#     (VERDICT #4): gather/dist floors, step-cap ladder, config grid,
#     and the new SearchParams(term='k') early-exit A/B.
#  F. skew x shared-tile-budget grid at 4.19M (VERDICT #9: the
#     reference's cache-size axis, exp_cache_size_and_skew.py).
#  G. 100M routed: extended p/kk ladder + routing-recenter A/B
#     (VERDICT #5: hunt the >=0.99 fast point; plateau diagnosis).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5f.log
exec >>"$LOG" 2>&1

echo "[r5f] $(date) waiting for r5e (pid $(cat /tmp/r5e.pid 2>/dev/null))"
for _ in $(seq 1 120); do
  [ -s /tmp/r5e.pid ] && break
  sleep 60
done
while kill -0 "$(cat /tmp/r5e.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
echo "[r5f] $(date) r5e done; cooling 300s"
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
print(f"[r5f] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5f] matmul sanity ok {float(y[0,0])} after {time.time()-t0:.0f}s",
      flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r5f] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5f] $(date) stage E: profile_hnsw 1M (VERDICT #4)"
timeout 7200 python scripts/profile_hnsw.py \
  || echo "[r5f] stage E failed (non-fatal)"
echo "[r5f] cooling 180s"; sleep 180; wait_tunnel

echo "[r5f] $(date) stage F: skew x budget 4.19M (VERDICT #9)"
SHINE_SKC_SHARED=4,8,12,16 timeout 7200 python scripts/exp_skew_capacity.py \
  || echo "[r5f] stage F failed (non-fatal)"
echo "[r5f] cooling 300s"; sleep 300; wait_tunnel

echo "[r5f] $(date) stage G: 100M routed ladder + recenter A/B (VERDICT #5)"
SHINE_CR_N=100663296 SHINE_CR_RECENTER=1 SHINE_GT_NSUB=262144 \
  SHINE_CR_SWEEP="96:768:32,128:1024:32,128:1024:32:256,160:1280:32,192:1536:32,256:2048:32" \
  timeout 21600 python scripts/scale_capacity_routed.py \
  || echo "[r5f] stage G failed (non-fatal)"

echo "[r5f] $(date) DONE"
