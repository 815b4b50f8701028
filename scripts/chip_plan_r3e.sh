#!/bin/bash
# Fourth r3 on-chip queue: validate the routed spill fix (balanced
# Lloyd refine + R=8 choices + nearest-open widening, commit e978c75)
# at real scale. Checkpoints are keyed _v2 so the stale R=2 tables
# cannot satisfy these runs.
#
#   A. 4.19M v2 smoke — quality gate: the v1 point was 29.9k QPS @
#      0.97; the v2 build must hold >= that.
#   B. 41.9M v2 rebuild + sweep — the decisive test: v1 ceiling was
#      0.80 at coverage 0.994 (31% of GT rows spilled to random
#      clusters); the fix predicts the routing ceiling moves to ~0.99.
#   C. 100.66M v2 — the reference's whole envelope on one chip at
#      routed QPS: both blockers (GT-transient OOM, comp double-buffer)
#      are fixed in-tree; ingest ~45-90 min.
#   D. bench refresh so the driver's final caches stay warm.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3e.log
exec >>"$LOG" 2>&1

echo "[r3e] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3e] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3e] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3e] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3e] $(date) stage A: 4.19M routed v2 smoke"
SHINE_CR_N=4194304 SHINE_CR_SWEEP="16:96:32,32:192:32" \
  timeout 3600 python scripts/scale_capacity_routed.py \
  || echo "[r3e] 4.19M v2 smoke failed (non-fatal)"

echo "[r3e] cooling 120s"
sleep 120

echo "[r3e] $(date) stage B: 41.9M routed v2 rebuild + sweep"
SHINE_CR_N=41943040 timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[r3e] 41.9M v2 stage failed (non-fatal)"

echo "[r3e] cooling 180s"
sleep 180

echo "[r3e] $(date) stage C: 100.66M routed v2 sweep"
SHINE_CR_N=100663296 SHINE_CR_SWEEP="16:192:32,16:256:32,32:256:32" \
  timeout 14400 python scripts/scale_capacity_routed.py \
  || echo "[r3e] 100M v2 stage failed (non-fatal)"

echo "[r3e] cooling 120s"
sleep 120

echo "[r3e] $(date) stage D: bench refresh"
timeout 3000 python bench.py || echo "[r3e] bench failed (non-fatal)"

echo "[r3e] $(date) DONE"
