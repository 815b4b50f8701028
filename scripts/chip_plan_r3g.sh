#!/bin/bash
# Sixth r3 on-chip queue: routed build v3 (96/cluster training floor,
# iterative widen, bounded assignment tiles — commit bfc7456).
#
#   A. 41.9M v3 rebuild + DEEP probe sweep. The checkpoint forensics
#      says nearest-assignment routing needs p=64 for ceiling 0.994;
#      the r3e sweep also showed QPS barely moves P=96 -> 256 (fixed
#      dispatch costs dominate), so wide probing is nearly free.
#   B. 100.66M v3 sweep (assignment-tile OOM fixed in-tree).
#   C. bench refresh so the driver's final caches stay warm.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3g.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3g] $(date) waiting for r3f pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3g] $(date) r3f exited; cooling 240s"
  sleep 240
fi

echo "[r3g] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3g] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3g] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3g] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3g] $(date) stage A: 41.9M routed v3 rebuild + deep sweep"
SHINE_CR_N=41943040 \
  SHINE_CR_SWEEP="16:192:32,32:256:32,48:384:32,64:512:32,64:768:32" \
  timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[r3g] 41.9M v3 stage failed (non-fatal)"

echo "[r3g] cooling 180s"
sleep 180

echo "[r3g] $(date) stage B: 100.66M routed v3 sweep"
SHINE_CR_N=100663296 \
  SHINE_CR_SWEEP="16:192:32,32:256:32,64:512:32" \
  timeout 14400 python scripts/scale_capacity_routed.py \
  || echo "[r3g] 100M v3 stage failed (non-fatal)"

echo "[r3g] cooling 120s"
sleep 120

echo "[r3g] $(date) stage C: bench refresh"
timeout 3000 python bench.py || echo "[r3g] bench failed (non-fatal)"

echo "[r3g] $(date) DONE"
