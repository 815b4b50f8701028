#!/bin/bash
# Third r3 on-chip queue: the three stages the resume queue could not
# finish, now fixed in-tree. Waits for the resume queue (chip_plan_
# resume.sh) to exit before touching the tunnel — concurrent big-HBM
# clients wedge it (docs/TPU_NOTES.md).
#
#   A. 41.9M routed eps re-score — loads the cached 5.8 GB checkpoint
#      (.bench_cache/routed_41943040*) and re-runs the sweep with the
#      new recall10_eps column (stage-A id-recall 0.73-0.80 is the
#      known near-tie ceiling; eps is the honest number).
#   B. 100.66M routed sweep — the aux layout OOM is fixed (in-scan
#      cluster-block layout); warm compile cache puts ingest ~15-25 min.
#   C. dispatch-trim ablation — ext table now cast bf16.
#   D. bench refresh so the driver's final caches stay warm.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3c.log
exec >>"$LOG" 2>&1

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  echo "[r3c] $(date) waiting for resume queue pid $PREV_PID to exit"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
  echo "[r3c] $(date) resume queue exited; cooling 240s"
  sleep 240
fi

echo "[r3c] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3c] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3c] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[r3c] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3c] $(date) stage A: 41.9M routed eps re-score (checkpoint load)"
SHINE_CR_N=41943040 timeout 7200 python scripts/scale_capacity_routed.py \
  || echo "[r3c] 41.9M eps re-score failed (non-fatal)"

echo "[r3c] cooling 120s"
sleep 120

echo "[r3c] $(date) stage B: 100.66M routed sweep (aux layout fixed)"
SHINE_CR_N=100663296 SHINE_CR_SWEEP="16:192:32,16:256:32,32:256:32" \
  timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[r3c] 100M routed stage failed (non-fatal)"

echo "[r3c] cooling 120s"
sleep 120

echo "[r3c] $(date) stage C: dispatch-trim ablation (bf16 ext fixed)"
timeout 3000 python scripts/tune_dispatch_trims.py \
  || echo "[r3c] trims stage failed (non-fatal)"

echo "[r3c] cooling 60s"
sleep 60

echo "[r3c] $(date) stage D: bench refresh"
timeout 3000 python bench.py || echo "[r3c] bench failed (non-fatal)"

echo "[r3c] $(date) DONE"
