#!/bin/bash
# Resume queue after the VM reboot killed chip_plan_r3final.sh mid
# stage 2 (41.9M routed ingest) and wiped the untracked caches
# (.jax_cache compile cache, .bench_cache graph checkpoints). Stage 1
# (4.19M routed sweep) completed and is committed; everything below is
# what remains, ordered most-valuable-first so another reboot costs the
# least. Timeouts are sized for COLD compiles (the persistent cache is
# empty). Cooling gaps between heavy runs — back-to-back big-HBM
# processes can wedge the tunnel (docs/TPU_NOTES.md).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_plan_resume.log
exec >>"$LOG" 2>&1

echo "[resume] $(date) waiting for the tunnel..."
until timeout 300 python - <<'PY'
import time, jax, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
print(f"[resume] devices after {time.time()-t0:.0f}s: {d}", flush=True)
x = jnp.ones((512, 512), jnp.bfloat16)
y = np.asarray(x @ x)
print("[resume] matmul sanity ok", float(y[0, 0]), flush=True)
PY
do
  echo "[resume] tunnel still down ($(date +%H:%M)); retrying in 120s"
  sleep 120
done

echo "[resume] $(date) stage A: routed capacity sweep at 41.9M (headline target)"
SHINE_CR_N=41943040 timeout 7200 python scripts/scale_capacity_routed.py \
  || echo "[resume] 41.9M routed stage failed (non-fatal)"

echo "[resume] cooling 120s"
sleep 120

echo "[resume] $(date) stage B: 100.66M routed split sweep (ingest ~35 min streamed)"
SHINE_CR_N=100663296 SHINE_CR_SWEEP="16:192:32,16:256:32,32:256:32" \
  timeout 10800 python scripts/scale_capacity_routed.py \
  || echo "[resume] 100M routed stage failed (non-fatal)"

echo "[resume] cooling 120s"
sleep 120

echo "[resume] $(date) stage C: dispatch-trim ablation at the 200k headline shape"
timeout 3000 python scripts/tune_dispatch_trims.py \
  || echo "[resume] trims stage failed (non-fatal)"

echo "[resume] cooling 60s"
sleep 60

echo "[resume] $(date) stage D: bench refresh (re-warms .bench_cache + .jax_cache)"
timeout 3000 python bench.py || echo "[resume] bench failed (non-fatal)"

echo "[resume] cooling 120s"
sleep 120

echo "[resume] $(date) stage E: split 41.9M prerank trim (stage-1 int8 -> exact regen)"
SHINE_CAPS_N=41943040 SHINE_CAPS_KB=32,64 SHINE_CAPS_PRERANK=16 \
  timeout 4800 python scripts/scale_capacity_split.py \
  || echo "[resume] split prerank stage failed (non-fatal)"

echo "[resume] cooling 120s"
sleep 120

echo "[resume] $(date) stage F: 10M HNSW M=16 build with the native merge stage"
SHINE_10MH_M=16 timeout 9000 python scripts/scale_10m_hnsw.py \
  || echo "[resume] 10M M=16 build failed (non-fatal)"

echo "[resume] cooling 90s"
sleep 90

echo "[resume] $(date) stage G: final bench refresh (warm caches for the driver)"
timeout 2400 python bench.py || echo "[resume] final bench failed (non-fatal)"

echo "[resume] $(date) DONE"
