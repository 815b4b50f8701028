#!/bin/bash
# Round-4 queue, leg I: waits for r4h, then the second half of
# VERDICT-r3 item #4 (efc=500 parity): a 10M x 128 M=32 pool=500 build
# + serving sweep against exact GT. Uses the device-resident base path
# and the stage checkpoint (a tunnel death mid-run resumes after L0).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4i.log
exec >>"$LOG" 2>&1

echo "[r4i] $(date) waiting for r4h (pid $(cat /tmp/r4h.pid 2>/dev/null))"
# wait for the pid file to EXIST first: kill -0 "" fails, and an early
# exit here would start this big-HBM run concurrently with r4h — the
# documented back-to-back pattern that wedges the TPU tunnel
for _ in $(seq 1 120); do
  [ -s /tmp/r4h.pid ] && break
  sleep 60
done
while kill -0 "$(cat /tmp/r4h.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
echo "[r4i] $(date) r4h done; starting"

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4i] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4i] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4i] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

echo "[r4i] cooling 300s after r4h"; sleep 300
wait_tunnel
echo "[r4i] $(date) stage N: 10M M=32 pool=500 (efc=500 parity at 10M)"
SHINE_10MH_M=32 SHINE_10MH_EFC=500 SHINE_10MH_ROWS=bf16 \
SHINE_10MH_RESUME=1 \
  timeout 28800 python scripts/scale_10m_hnsw.py \
  || echo "[r4i] stage N failed (non-fatal)"

echo "[r4i] $(date) DONE"
