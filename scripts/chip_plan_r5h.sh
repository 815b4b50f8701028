#!/bin/bash
# Round-5 leg H: waits for the in-flight stage C (10.5M pool=500,
# started under the pre-packed-neighbors code), then:
#  B3. 16.78M serve-only rerun (graph ckpt exists; serving now uses the
#      packed layer-0 table — the unpacked (N,64) gather relayout was
#      an 8 GB HLO temp and OOM'd the first serve).
#  D.  bench --gate.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r5h.log
exec >>"$LOG" 2>&1

WAIT_PID="${1:-0}"
echo "[r5h] $(date) waiting for stage C (pid $WAIT_PID)"
while kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 180
done
echo "[r5h] $(date) stage C done; cooling 300s"
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
print(f"[r5h] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print(f"[r5h] matmul ok after {time.time()-t0:.0f}s", flush=True)
PY
}
wait_tunnel() {
  until probe; do
    echo "[r5h] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r5h] $(date) stage B3: 16.78M serve-only (packed neighbor table)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  SHINE_GT_NEVAL=128 timeout 10800 python scripts/scale_10m_hnsw.py \
  || echo "[r5h] stage B3 failed (non-fatal)"
echo "[r5h] cooling 300s"; sleep 300; wait_tunnel

echo "[r5h] $(date) stage D: bench --gate"
timeout 5400 python bench.py --gate \
  || echo "[r5h] stage D rc=$? (non-fatal)"

echo "[r5h] $(date) DONE"
