#!/bin/bash
# Round-4 queue, third leg: waits for r4b to drain, then runs the
# scan-tiling grid inside the mega program (profile_mega SHINE_PROF_GRID;
# the B=4096 scan runs ~96 TF/s at tq=512/tn=2048 — if a tiling recovers
# the ~173 TF/s marginal kernel rate, the mega ceiling moves ~1.0M ->
# ~1.3M QPS/chip), at both the bench N=200k and the 1M point.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4c.log
exec >>"$LOG" 2>&1

echo "[r4c] $(date) waiting for r4b (pid $(cat /tmp/r4b.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/r4b.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
echo "[r4c] $(date) r4b done; starting"

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4c] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4c] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4c] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r4c] $(date) stage F: mega scan grid at N=200k (bench shape)"
SHINE_PROF_GRID=1 timeout 5400 python scripts/profile_mega.py \
  || echo "[r4c] stage F failed (non-fatal)"
echo "[r4c] cooling 120s"; sleep 120; wait_tunnel

echo "[r4c] $(date) stage G: mega scan grid at N=1M"
SHINE_PROF_GRID=1 SHINE_PROF_N=1048576 timeout 5400 \
  python scripts/profile_mega.py \
  || echo "[r4c] stage G failed (non-fatal)"

echo "[r4c] $(date) DONE"

echo "[r4c] cooling 120s"; sleep 120; wait_tunnel
echo "[r4c] $(date) stage H: 10M M=16 graph rebuild + margin scoring"
# the r3 checkpoints did not survive the round boundary, so this is a
# fresh ~1900 s build; it regenerates the 10M M=16 artifact AND gives
# the r3 id-recall 0.916 / eps 0.9987 point its margin-filtered reading
# (the 16.78M M=32 margin point comes from r4b stage B)
SHINE_10MH_M=16 timeout 7200 python scripts/scale_10m_hnsw.py \
  || echo "[r4c] stage H failed (non-fatal)"
echo "[r4c] $(date) DONE (with H)"
