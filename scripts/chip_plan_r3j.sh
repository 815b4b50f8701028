#!/bin/bash
# Ninth r3 on-chip queue: refresh the 1M x 64 operating points — keep2
# now auto-fuses its select (commit 3629c70, measured +37% at 200k) and
# the IVF builders take R=8 assignment choices; the recorded 1M numbers
# predate both.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3j.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3j] $(date) waiting for r3i pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3j] $(date) r3i exited; cooling 300s"
  sleep 300
fi

echo "[r3j] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3j] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3j] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3j] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3j] $(date) stage A: 1M dataset + GT (cached npz)"
timeout 1800 python scripts/scale_1m_validation.py gt \
  || echo "[r3j] 1M gt failed (non-fatal)"

echo "[r3j] cooling 60s"
sleep 60

echo "[r3j] $(date) stage B: 1M on-chip operating points (fused keep2, R=8 IVF)"
timeout 3600 python scripts/scale_1m_validation.py onchip \
  || echo "[r3j] 1M onchip failed (non-fatal)"

echo "[r3j] $(date) DONE"
