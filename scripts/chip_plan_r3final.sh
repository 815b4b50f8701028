#!/bin/bash
# Round-3 final on-chip measurement queue. Parked under nohup while the
# tunnel is down; step 0 retries until the backend answers AND a sanity
# matmul completes (a wedged jax.devices() is bounded by timeout so the
# loop actually retries). Cooling gaps between heavy runs — back-to-back
# big-HBM processes can wedge the tunnel (docs/TPU_NOTES.md).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3final.log
exec >>"$LOG" 2>&1

echo "[plan] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[plan] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[plan] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[plan] tunnel still down ($(date +%H:%M)); retrying in 120s"
  sleep 120
done

echo "[plan] $(date) stage 1: routed kernel smoke + knob sweep at 4.19M"
SHINE_CR_N=4194304 SHINE_CR_SWEEP="16:96:32,16:128:32,16:96:64" \
  timeout 2400 python scripts/scale_capacity_routed.py \
  || { echo "[plan] 4.19M stage FAILED (continuing: later stages are independent)"; SKIP_419=1; }

echo "[plan] cooling 90s"
sleep 90

echo "[plan] $(date) stage 2: routed capacity sweep at 41.9M (the headline target)"
if [ "${SKIP_419:-0}" = "1" ]; then
  echo "[plan] skipping 41.9M (4.19M smoke failed; fix the kernel first)"
else
  SHINE_CR_N=41943040 timeout 5400 python scripts/scale_capacity_routed.py \
    || echo "[plan] 41.9M stage failed (non-fatal)"
fi

echo "[plan] cooling 90s"
sleep 90

echo "[plan] $(date) stage 3: dispatch-trim ablation at the 200k headline shape"
timeout 2400 python scripts/tune_dispatch_trims.py \
  || echo "[plan] trims stage failed (non-fatal)"

echo "[plan] cooling 60s"
sleep 60

echo "[plan] $(date) stage 4: bench refresh"
timeout 1800 python bench.py || echo "[plan] bench failed (non-fatal)"

echo "[plan] $(date) DONE"

echo "[plan] cooling 90s"
sleep 90

echo "[plan] $(date) stage 5: split 41.9M prerank trim (stage-1 int8 -> exact regen)"
SHINE_CAPS_N=41943040 SHINE_CAPS_KB=32,64 SHINE_CAPS_PRERANK=16 \
  timeout 3600 python scripts/scale_capacity_split.py \
  || echo "[plan] split prerank stage failed (non-fatal)"

echo "[plan] cooling 120s"
sleep 120

echo "[plan] $(date) stage 6: 10M HNSW M=16 rebuild with the native merge stage"
SHINE_10MH_REBUILD=1 SHINE_10MH_M=16 timeout 5400 \
  python scripts/scale_10m_hnsw.py \
  || echo "[plan] 10M M=16 rebuild failed (non-fatal)"

echo "[plan] $(date) DONE (appended stages)"
