#!/bin/bash
# Fifth r3 on-chip queue: measure the v5 fused scan+select kernels
# (commit 2778bf1) end-to-end. Waits for the r3e queue to exit first —
# concurrent big-HBM clients wedge the tunnel (docs/TPU_NOTES.md).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3f.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3f] $(date) waiting for r3e pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3f] $(date) r3e exited; cooling 240s"
  sleep 240
fi

echo "[r3f] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3f] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3f] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3f] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3f] $(date) stage A: dispatch-trim ablation incl. fused select"
timeout 3600 python scripts/tune_dispatch_trims.py \
  || echo "[r3f] trims stage failed (non-fatal)"

echo "[r3f] $(date) DONE"
