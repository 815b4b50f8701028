#!/bin/bash
# Seventh r3 on-chip queue: re-measure the split fused select (tq cap
# fix, commit 4a8a5cc) and leave the driver a fresh warm bench.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3h.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3h] $(date) waiting for r3g pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3h] $(date) r3g exited; cooling 240s"
  sleep 240
fi

echo "[r3h] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3h] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3h] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3h] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3h] $(date) stage A: trims ablation (split fused tq fix)"
timeout 3600 python scripts/tune_dispatch_trims.py \
  || echo "[r3h] trims stage failed (non-fatal)"

echo "[r3h] cooling 60s"
sleep 60

echo "[r3h] $(date) stage B: final bench refresh"
timeout 3000 python bench.py || echo "[r3h] bench failed (non-fatal)"

echo "[r3h] $(date) DONE"
