#!/bin/bash
# Tenth r3 on-chip queue (fresh host, caches empty): the dead r3h/r3i/r3j
# work reordered for a cold host — bench first (warms .jax_cache +
# .bench_cache for the driver's end-of-round run), then the 1M operating
# point refresh, then the trims ablation, then the 100M routed v3 retry.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r3k.log
exec >>"$LOG" 2>&1

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r3k] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r3k] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

echo "[r3k] $(date) waiting for the tunnel..."
until probe; do
  echo "[r3k] tunnel still down ($(date +%H:%M)); retrying in 180s"
  sleep 180
done

echo "[r3k] $(date) stage A: bench refresh (cold caches)"
timeout 3600 python bench.py || echo "[r3k] bench failed (non-fatal)"

echo "[r3k] cooling 90s"; sleep 90

echo "[r3k] $(date) stage B: 1M dataset + GT"
timeout 1800 python scripts/scale_1m_validation.py gt \
  || echo "[r3k] 1M gt failed (non-fatal)"
echo "[r3k] cooling 60s"; sleep 60

echo "[r3k] $(date) stage C: 1M operating points (fused keep2, R=8 IVF)"
timeout 3600 python scripts/scale_1m_validation.py onchip \
  || echo "[r3k] 1M onchip failed (non-fatal)"
echo "[r3k] cooling 120s"; sleep 120

echo "[r3k] $(date) stage D: trims ablation (split fused tq fix)"
timeout 3600 python scripts/tune_dispatch_trims.py \
  || echo "[r3k] trims stage failed (non-fatal)"
echo "[r3k] cooling 180s"; sleep 180

echo "[r3k] $(date) stage E: 100.66M routed v3 sweep (no checkpoint)"
SHINE_CR_N=100663296 SHINE_CR_SAVE=0 \
  SHINE_CR_SWEEP="16:192:32,32:256:32,48:384:32,64:512:32" \
  timeout 14400 python scripts/scale_capacity_routed.py \
  || echo "[r3k] 100M v3 retry failed (non-fatal)"

echo "[r3k] cooling 120s"; sleep 120
echo "[r3k] $(date) stage F: final bench refresh"
timeout 3000 python bench.py || echo "[r3k] bench failed (non-fatal)"

echo "[r3k] $(date) DONE"
