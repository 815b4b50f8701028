#!/bin/bash
# Staged on-chip plan for the routed split sweep. Run under a long
# outer timeout; step 0 blocks until the axon tunnel answers, so the
# whole thing can be parked in the background while the tunnel is down.
# Stages append to results/scale_capacity_routed.jsonl; progress lines
# go to stdout.
set -u
cd "$(dirname "$0")/.."

echo "[plan] waiting for the tunnel (blocking jax.devices(), retry loop)..."
until python - <<'PY'
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

echo "[plan] stage 1: routed kernel smoke + knob sweep at 4.19M"
SHINE_CR_N=4194304 timeout 2400 python scripts/scale_capacity_routed.py \
  || { echo "[plan] 4.19M stage failed"; exit 1; }

echo "[plan] cooling 60s (back-to-back big-HBM runs can wedge the tunnel)"
sleep 60

echo "[plan] stage 2: routed capacity point at 41.9M"
SHINE_CR_N=41943040 timeout 4800 python scripts/scale_capacity_routed.py \
  || { echo "[plan] 41.9M stage failed"; exit 1; }

echo "[plan] DONE"
