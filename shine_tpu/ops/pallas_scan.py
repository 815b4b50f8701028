"""Fused brute-force scan kernel: matmul + in-VMEM block reduction.

The XLA flat scan (models/flat.py) is output-bound: the (B, N) distance
tile costs B*N*4 bytes of HBM traffic to write and top_k reads it back at
~22 GB/s on this part (docs/TPU_NOTES.md) — 180 ms for a 4096 x 200k scan
whose matmul alone is ~4 ms of MXU time. This kernel keeps each distance
tile in VMEM and reduces it to per-block (128-row) score maxima + argmax
immediately, so HBM sees only the base read plus a (B, N/128) summary —
a ~64x traffic cut.

Exactness model: a true top-k row's block must rank within the top
`kb` blocks by max (its max >= the row's score), so scanning the top-kb
block maxima + their argmax rows recovers the top-k unless two of the
true top-k fall in one 128-row block and both are needed (P ~ k^2 * 128/N
per query; ~0.3% at k=10, N=200k — measured recall ~0.997). The final
ordering is recovered by an exact f32 re-rank (ops/distance.rerank_topk).

Scoring uses a packed table: ext[:, :d] = 2v (L2) or v (IP);
ext[:, d] = -||v||^2 (L2) or 0; q_ext = [q | 1] gives
score = 2<q,v> - ||v||^2 (monotone in -distance) with one bf16 matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from shine_tpu.config import METRIC_L2

BLK = 128  # rows reduced per score column
NEG = -3e38  # bf16/f32-representable 'minus infinity'


def _scan_kernel(q_ref, base_ref, max_ref, arg_ref, max2_ref, arg2_ref, *, tn: int):
    j = pl.program_id(0)  # base-tile index (outer: base streams once)
    q = q_ref[:]  # (TQ, d+pad) bf16
    b = base_ref[:]  # (TN, d+pad) bf16
    dots = jax.lax.dot_general(
        q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TN)
    tq = dots.shape[0]
    dd = dots.reshape(tq, tn // BLK, BLK)
    base0 = j * tn
    offs = base0 + jax.lax.broadcasted_iota(jnp.int32, (tq, tn // BLK), 1) * BLK
    m1 = jnp.max(dd, axis=2)
    a1 = jnp.argmax(dd, axis=2).astype(jnp.int32)
    # outputs are stored transposed (NB, B) so the block's trailing dim is
    # the 128-divisible query tile (Mosaic tiling constraint)
    max_ref[:] = m1.T
    arg_ref[:] = (offs + a1).T
    # block second-best: shadowing then needs 3 true top-k in one block
    lane = jax.lax.broadcasted_iota(jnp.int32, dd.shape, 2)
    dd2 = jnp.where(lane == a1[:, :, None], jnp.float32(-3e38), dd)
    max2_ref[:] = jnp.max(dd2, axis=2).T
    arg2_ref[:] = (offs + jnp.argmax(dd2, axis=2).astype(jnp.int32)).T


@partial(jax.jit, static_argnames=("tq", "tn", "interpret"))
def blockmax_scan(
    ext: jnp.ndarray,  # (N_pad, dp) bf16 packed table, N_pad % tn == 0
    q_ext: jnp.ndarray,  # (B, dp) bf16, B % tq == 0
    *,
    tq: int = 256,
    tn: int = 1024,
    interpret: bool = False,
):
    """Returns (max1, arg1, max2, arg2): the two best (score, row) pairs
    per 128-row block, shapes (B, N/BLK) (stored transposed internally)."""
    N, dp = ext.shape
    B = q_ext.shape[0]
    assert N % tn == 0 and B % tq == 0 and tn % BLK == 0
    # base-tile-major grid: the (large) base block changes only on the
    # outer index, so HBM streams the base exactly once per call
    grid = (N // tn, B // tq)
    spec = pl.BlockSpec((tn // BLK, tq), lambda j, i: (j, i))
    outs = pl.pallas_call(
        partial(_scan_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, dp), lambda j, i: (i, 0)),
            pl.BlockSpec((tn, dp), lambda j, i: (j, 0)),
        ],
        out_specs=[spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((N // BLK, B), jnp.float32),
            jax.ShapeDtypeStruct((N // BLK, B), jnp.int32),
            jax.ShapeDtypeStruct((N // BLK, B), jnp.float32),
            jax.ShapeDtypeStruct((N // BLK, B), jnp.int32),
        ],
        interpret=interpret,
    )(q_ext, ext)
    return tuple(o.T for o in outs)


def pack_ext_table(vectors: np.ndarray, metric: int, n_pad: int) -> np.ndarray:
    """Host-side packed score table (see module docstring).

    The L2 norm term is residual-encoded over TWO columns (c0 =
    bf16-rounded -||v||^2, c1 = the rounding remainder): ||v||^2 is the
    largest magnitude in the row, and a single bf16 slot quantizes it at
    ~||v||^2 * 2^-9 — measured +-8 absolute at d=128 synthetic scale,
    bigger than true neighbor gaps, which capped ext-only re-rank recall
    at 0.717 (docs/TPU_NOTES.md 20M section). The double-bf16 pair
    carries ~16 mantissa bits; the query puts 1.0 in both columns so
    every scan/re-rank dot picks the correction up for free."""
    n, d = vectors.shape
    v = vectors.astype(np.float32)
    dp = -(-(d + 2) // 128) * 128  # lane-pad the feature dim
    ext = np.zeros((n_pad, dp), np.float32)
    if metric == METRIC_L2:
        import ml_dtypes

        ext[:n, :d] = 2.0 * v
        t = -(v * v).sum(-1)
        c0 = t.astype(ml_dtypes.bfloat16).astype(np.float32)
        ext[:n, d] = c0
        ext[:n, d + 1] = t - c0
    else:
        ext[:n, :d] = v
    ext[n:, d] = NEG  # padding rows score -inf
    return ext


def pack_ext_query(q: np.ndarray | jnp.ndarray, dp: int) -> jnp.ndarray:
    B, d = q.shape
    qe = jnp.zeros((B, dp), jnp.float32)
    qe = qe.at[:, :d].set(jnp.asarray(q, jnp.float32))
    # 1.0 in BOTH norm columns (c0 + residual; IP tables keep d+1 = 0)
    qe = qe.at[:, d].set(1.0)
    if d + 1 < dp:
        qe = qe.at[:, d + 1].set(1.0)
    return qe
