#!/bin/bash
# Eighth r3 on-chip queue: 100.66M routed v3 retry. The first attempt
# built cleanly (assign rr=0) but wedged pulling the 14 GB comp table
# to the host for the checkpoint; the script now sweeps BEFORE saving
# and SHINE_CR_SAVE=0 skips the download entirely.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3i.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3i] $(date) waiting for r3h pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3i] $(date) r3h exited; cooling 300s"
  sleep 300
fi

echo "[r3i] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3i] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3i] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3i] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3i] $(date) stage A: 100.66M routed v3 sweep (no checkpoint)"
SHINE_CR_N=100663296 SHINE_CR_SAVE=0 \
  SHINE_CR_SWEEP="16:192:32,32:256:32,48:384:32,64:512:32" \
  timeout 14400 python scripts/scale_capacity_routed.py \
  || echo "[r3i] 100M v3 retry failed (non-fatal)"

echo "[r3i] cooling 120s"
sleep 120

echo "[r3i] $(date) stage B: final bench refresh"
timeout 3000 python bench.py || echo "[r3i] bench failed (non-fatal)"

echo "[r3i] $(date) DONE"
