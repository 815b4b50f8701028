#!/bin/bash
# Follow-up on-chip queue: the 100.66M routed split measurement — the
# reference's full 100M envelope on ONE chip served with routed pruning
# (flat split sweep baseline: 1.25k QPS, results/scale_capacity_split
# .jsonl). Chained after scripts/chip_plan_r3final.sh: waits for that
# pid to exit, cools, probes the tunnel, then runs the sweep the CPU
# routing study picked for C~25.8k geometry (p16/P192 cov 0.980,
# p16/P256 0.995, results/route_coverage.jsonl). Ends with a bench
# refresh so .bench_cache + .jax_cache are warm for the driver's final
# bench even if the earlier stage-4 attempt timed out cold.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_100m_routed.log
exec >>"$LOG" 2>&1

echo "[plan100] $(date) waiting for chip_plan_r3final (pid file /tmp/chipplan.pid)"
if [ -f /tmp/chipplan.pid ]; then
  while kill -0 "$(cat /tmp/chipplan.pid)" 2>/dev/null; do
    sleep 120
  done
fi
echo "[plan100] $(date) prior queue done; cooling 180s"
sleep 180

until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[plan100] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[plan100] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[plan100] tunnel down ($(date +%H:%M)); retrying in 120s"
  sleep 120
done

echo "[plan100] $(date) 100.66M routed split sweep (ingest ~35 min streamed)"
SHINE_CR_N=100663296 SHINE_CR_SWEEP="16:192:32,16:256:32,32:256:32" \
  timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[plan100] 100M routed stage failed (non-fatal)"

echo "[plan100] cooling 120s"
sleep 120

echo "[plan100] $(date) bench refresh (warms .bench_cache graph + compile cache)"
timeout 2400 python bench.py || echo "[plan100] bench failed (non-fatal)"

echo "[plan100] $(date) DONE"
