#!/bin/bash
# Round-4 on-chip queue, ordered by VERDICT-r3 value:
#   A  routed 100M deep-probe sweep (missing #4: close to >=0.95)
#   B  20M x M=32 graph build + bf16 serving (missing #1: 100M-class graph
#      per-shard unit; 8 chips x 20M = 160M)
#   C  1M M=32 efc ladder: default pool vs pool=500 (missing #2 efc parity)
#   D  skew x probe-budget ablation at 4.19M (missing #5)
#   E  bench --gate (floors validation on chip)
#   F  (time permitting) 10M M=32 efc=500 build
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_r4a.log
exec >>"$LOG" 2>&1

probe() {
  timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[r4a] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[r4a] matmul sanity ok", float(y[0, 0]), flush=True)
PY
}

wait_tunnel() {
  until probe; do
    echo "[r4a] tunnel down ($(date +%H:%M)); retrying in 180s"
    sleep 180
  done
}

START=$(date +%s)
echo "[r4a] $(date) queue start"
wait_tunnel

echo "[r4a] $(date) stage A: 100.66M routed deep-probe sweep"
SHINE_CR_N=100663296 SHINE_CR_SAVE=0 \
SHINE_CR_SWEEP="64:512:32,96:768:32,128:1024:32,96:768:64" \
  timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[r4a] stage A failed (non-fatal)"
echo "[r4a] cooling 180s"; sleep 180; wait_tunnel

echo "[r4a] $(date) stage B: 16.78M x M=32 graph build + bf16 serving"
# 16.78M is the largest the EXISTING sweep path fits in 16 GB HBM
# (f32 base 8.6 GB + bf16 ext 4.3 GB); x8 chips = 134M, the reference's
# 100M class. The pool download is (n, 66) x 8 B = 8.9 GB on this
# tunnel — the binding constraint for wider pools at 10M+ (see
# docs/TPU_NOTES.md r4 'efc parity'); a colocated host pays seconds.
SHINE_10MH_N=16777216 SHINE_10MH_M=32 SHINE_10MH_ROWS=bf16 \
  timeout 14400 python scripts/scale_10m_hnsw.py \
  || echo "[r4a] stage B failed (non-fatal)"
echo "[r4a] cooling 180s"; sleep 180; wait_tunnel

echo "[r4a] $(date) stage C: 1M M=32 efc ladder (pool default/200/500)"
SHINE_1M_M=32 timeout 5400 python scripts/scale_1m_hnsw.py \
  || echo "[r4a] stage C1 failed (non-fatal)"
echo "[r4a] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=200 timeout 7200 python scripts/scale_1m_hnsw.py \
  || echo "[r4a] stage C2 failed (non-fatal)"
echo "[r4a] cooling 120s"; sleep 120; wait_tunnel
SHINE_1M_M=32 SHINE_1M_EFC=500 timeout 9000 python scripts/scale_1m_hnsw.py \
  || echo "[r4a] stage C3 failed (non-fatal)"
echo "[r4a] cooling 120s"; sleep 120; wait_tunnel

echo "[r4a] $(date) stage D: skew x probe ablation at 4.19M"
timeout 5400 python scripts/exp_skew_capacity.py \
  || echo "[r4a] stage D failed (non-fatal)"
echo "[r4a] cooling 120s"; sleep 120; wait_tunnel

echo "[r4a] $(date) stage E: bench --gate"
timeout 3600 python bench.py --gate || echo "[r4a] gate rc=$?"

ELAPSED=$(( $(date +%s) - START ))
echo "[r4a] $(date) DONE (elapsed ${ELAPSED}s)"
