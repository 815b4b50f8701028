#!/bin/bash
# Fourth r3 on-chip queue: the BASELINE.md envelope configs beyond
# 128-d L2 — GIST1M-class high-dim (1M x 960, VMEM tiling at dp=1024)
# and DEEP10M-class inner product (10.5M x 96 ip) — via the capacity
# script's new metric/dim knobs. Chains behind chip_plan_r3c.sh.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3d.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3d] $(date) waiting for r3c queue pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3d] $(date) r3c exited; cooling 240s"
  sleep 240
fi

echo "[r3d] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3d] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3d] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3d] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3d] $(date) stage A: GIST1M-class 1M x 960-d L2"
SHINE_CAP_N=1048576 SHINE_CAP_D=960 SHINE_CAP_RCHUNK=32768 \
  timeout 4800 python scripts/scale_capacity.py \
  || echo "[r3d] 960-d stage failed (non-fatal)"

echo "[r3d] cooling 120s"
sleep 120

echo "[r3d] $(date) stage B: DEEP10M-class 10.5M x 96-d inner product"
SHINE_CAP_N=10485760 SHINE_CAP_D=96 SHINE_CAP_METRIC=ip \
  timeout 4800 python scripts/scale_capacity.py \
  || echo "[r3d] 96-d ip stage failed (non-fatal)"

echo "[r3d] $(date) DONE"
