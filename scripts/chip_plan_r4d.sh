#!/bin/bash
# Round-4 queue, fourth leg: waits for r4c, then
#  I. diag_1m_recall chip leg — localize the 1M x 128 recall gap
#     (chip 0.9296 vs CPU model 0.9996, results/study_kb_1m.jsonl):
#     on-chip GT crosscheck + search() config ablation.
#  J. 16.78M x M=32 graph retry with the self-sweep arg fix (r4b stage B
#     OOM'd at compile: the base passed as two 8.6 GB parameters).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4d.log
exec >>"$LOG" 2>&1

echo "[r4d] $(date) waiting for r4c (pid $(cat /tmp/r4c.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/r4c.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
echo "[r4d] $(date) r4c done; starting"

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4d] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4d] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4d] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r4d] $(date) stage I: 1M recall diagnostic (GT crosscheck + ablation)"
timeout 3600 python scripts/diag_1m_recall.py \
  || echo "[r4d] stage I failed (non-fatal)"
echo "[r4d] cooling 180s"; sleep 180; wait_tunnel

echo "[r4d] $(date) stage J: 16.78M x M=32 retry (self-sweep arg fix)"
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  timeout 18000 python scripts/scale_10m_hnsw.py \
  || echo "[r4d] stage J failed (non-fatal)"

echo "[r4d] $(date) DONE"
