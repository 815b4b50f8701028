#!/bin/bash
# Round-4 queue, fifth leg: waits for r4d, then re-measures everything
# the bf16-grade device-GT bug (TPU_NOTES r4 "ROOT CAUSE", fixed in
# models/flat.py:flat_search precision=HIGHEST) had under-reported:
#  K. 1M x 128 M=32 efc ladder rerun (pool default/200/500) — the r4b
#     readings capped at the corrupted scorer's 0.9296; post-fix the
#     ladder measures real construction quality.
#  L. final bench --gate for the round (fresh gate + BENCH numbers).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4e.log
exec >>"$LOG" 2>&1

echo "[r4e] $(date) waiting for r4d (pid $(cat /tmp/r4d.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/r4d.pid 2>/dev/null)" 2>/dev/null; do
  sleep 300
done
echo "[r4e] $(date) r4d done; starting"

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4e] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4e] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4e] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

wait_tunnel
echo "[r4e] $(date) stage K: 1M M=32 efc ladder rerun (exact GT)"
SHINE_1M_M=32 timeout 5400 python scripts/scale_1m_hnsw.py \
  || echo "[r4e] stage K1 failed (non-fatal)"
echo "[r4e] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=200 timeout 7200 python scripts/scale_1m_hnsw.py \
  || echo "[r4e] stage K2 failed (non-fatal)"
echo "[r4e] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=500 timeout 9000 python scripts/scale_1m_hnsw.py \
  || echo "[r4e] stage K3 failed (non-fatal)"
echo "[r4e] cooling 180s"; sleep 180; wait_tunnel

echo "[r4e] $(date) stage L: final bench --gate"
timeout 3600 python bench.py --gate \
  || echo "[r4e] stage L failed rc=$? (non-fatal)"
echo "[r4e] $(date) DONE"
