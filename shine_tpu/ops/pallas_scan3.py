"""Fused brute-force scan, v3: running class-max in VMEM.

v2 (pallas_scan2.py) still wrote (B, N/32) block summaries (50 MB) and
re-read the base once per 64-query tile — measured 40 ms for 4096 x 200k.
v3 keeps a *running* reduction in VMEM across the whole base sweep: each
base row belongs to one of CLS (=1024) classes (row % CLS under the
strided layout), and the kernel maintains, per query, the best (score,
row) of every class. Outputs shrink to (B, CLS) — independent of N — so
the query tile can be large (fewer base re-reads) and the host-side
top-k runs over 1024 columns instead of N/32.

Recall model: a true top-k row is lost only if a better top-k row shares
its class; expected loss ~ C(k,2)/CLS per query (~0.44% of rows at k=10,
CLS=1024; rows are shuffled at build). The exact f32 re-rank of the top
kb class representatives recovers ordering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLS = 1024  # default row classes = output columns per query
TN = 2048  # default base rows per DMA chunk


def _kernel(q_ref, ext_hbm, m_ref, r_ref, *, n_pad: int, tn: int, cls: int):
    num_chunks = n_pad // tn
    members = tn // cls

    def body(buf_ref, sem_ref):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                ext_hbm.at[pl.ds(chunk * tn, tn), :],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        get_dma(0, 0).start()
        q = q_ref[:]  # (TQ, dp) bf16
        tq = q.shape[0]
        # the output refs double as the running state (VMEM-resident for
        # the whole grid step)
        m_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        r_ref[:] = jnp.zeros((tq, cls), jnp.int32)

        def step(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            blk = buf_ref[slot]
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, TN)
            dd = dots.reshape(tq, members, cls)  # lane-preserving
            sm = m_ref[:]
            sr = r_ref[:]
            # lean select: the row state holds the scalar member code
            # c*members + m; rows (= code*cls + lane) materialize once
            # after the sweep — the per-member row-vector arithmetic was
            # a third of the VPU select work that bounds the scan at
            # the margin (docs/TPU_NOTES.md 'Split kernel operating
            # points'). Strict > keeps earliest-row-wins tie order.
            for m in range(members):
                cur = dd[:, m, :]
                better = cur > sm
                sm = jnp.where(better, cur, sm)
                sr = jnp.where(better, c * members + m, sr)
            m_ref[:] = sm
            r_ref[:] = sr
            return _

        jax.lax.fori_loop(0, num_chunks, step, None)
        lane = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], cls), 1)
        r_ref[:] = r_ref[:] * cls + lane

    pl.run_scoped(
        body,
        buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), jnp.bfloat16),
        sem_ref=pltpu.SemaphoreType.DMA((2,)),
    )


def _kernel2(q_ref, ext_hbm, m_ref, r_ref, m2_ref, r2_ref, *, n_pad: int,
             tn: int, cls: int):
    """v4: class-max AND class-runner-up.

    At large rows-per-class (10M rows / 4096 classes = 2441) a true
    neighbor is lost whenever ONE decoy row in its class beats it under
    bf16 score quantization (~0.4% relative) — measured recall caps at
    ~0.91 at 10M (docs/TPU_NOTES.md). Keeping the second-best row per
    class recovers exactly the one-decoy case: the re-rank sees both and
    the exact f32 distances decide. Costs ~2x the VPU select work per
    chunk and 2x the running state; the MXU dot is unchanged.
    """
    num_chunks = n_pad // tn
    members = tn // cls

    def body(buf_ref, sem_ref):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                ext_hbm.at[pl.ds(chunk * tn, tn), :],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        get_dma(0, 0).start()
        q = q_ref[:]
        tq = q.shape[0]
        m_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        r_ref[:] = jnp.zeros((tq, cls), jnp.int32)
        m2_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        r2_ref[:] = jnp.zeros((tq, cls), jnp.int32)

        def step(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            blk = buf_ref[slot]
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dd = dots.reshape(tq, members, cls)
            sm, sr = m_ref[:], r_ref[:]
            sm2, sr2 = m2_ref[:], r2_ref[:]
            # lean select (see _kernel): row state = scalar member code,
            # rows materialize once after the sweep
            for m in range(members):
                cur = dd[:, m, :]
                code = c * members + m
                win = cur > sm
                second = (cur > sm2) & ~win
                # old winner demotes when beaten; else challenger may
                # take the runner-up slot
                sm2 = jnp.where(win, sm, jnp.where(second, cur, sm2))
                sr2 = jnp.where(win, sr, jnp.where(second, code, sr2))
                sm = jnp.where(win, cur, sm)
                sr = jnp.where(win, code, sr)
            m_ref[:], r_ref[:] = sm, sr
            m2_ref[:], r2_ref[:] = sm2, sr2
            return _

        jax.lax.fori_loop(0, num_chunks, step, None)
        lane = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], cls), 1)
        r_ref[:] = r_ref[:] * cls + lane
        r2_ref[:] = r2_ref[:] * cls + lane

    pl.run_scoped(
        body,
        buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), jnp.bfloat16),
        sem_ref=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("tq", "tn", "cls", "interpret"))
def classmax2_scan(
    ext: jnp.ndarray,
    q_ext: jnp.ndarray,
    *,
    tq: int = 512,
    tn: int = TN,
    cls: int = CLS,
    interpret: bool = False,
):
    """Returns (best (B, cls) f32, rows (B, cls) i32, best2, rows2)."""
    n_pad, dp = ext.shape
    B = q_ext.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0
    spec = pl.BlockSpec((tq, cls), lambda i: (i, 0))
    return pl.pallas_call(
        partial(_kernel2, n_pad=n_pad, tn=tn, cls=cls),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, cls), jnp.float32),
            jax.ShapeDtypeStruct((B, cls), jnp.int32),
            jax.ShapeDtypeStruct((B, cls), jnp.float32),
            jax.ShapeDtypeStruct((B, cls), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # running state is (tq, cls) x4 f32/i32 in VMEM; the default
            # 16 MB scoped cap rejects tq=1024 x cls>=1024 tilings that
            # are otherwise profitable (fewer grid steps)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_ext, ext)


@partial(jax.jit, static_argnames=("tq", "tn", "cls", "interpret"))
def classmax_scan(
    ext: jnp.ndarray,  # (N_pad, dp) bf16, N_pad % tn == 0
    q_ext: jnp.ndarray,  # (B, dp) bf16, B % tq == 0
    *,
    tq: int = 1024,
    tn: int = TN,
    cls: int = CLS,
    interpret: bool = False,
):
    """Returns (best (B, cls) f32, rows (B, cls) i32)."""
    n_pad, dp = ext.shape
    B = q_ext.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0
    spec = pl.BlockSpec((tq, cls), lambda i: (i, 0))
    return pl.pallas_call(
        partial(_kernel, n_pad=n_pad, tn=tn, cls=cls),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, cls), jnp.float32),
            jax.ShapeDtypeStruct((B, cls), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_ext, ext)


def _topk_epilogue(sm, rows, kb: int, cls: int, extras=()):
    """Exact iterative top-kb over the class lanes, inside the kernel.

    Tie semantics match jax.lax.top_k (value desc, first lane wins), so
    the fused kernel is drop-in for classmax_scan + top_k + gather: per
    step, the max lane is located via a min-reduce over an iota mask
    (no cumsum — Mosaic-friendly), its row is extracted with a masked
    sum, and the lane is burned to NEG. kb passes of ~7 VPU ops over
    (tq, cls) replace the XLA TopK program AND the (B, cls) HBM
    round-trip — the measured 2.4 ms select in the 200k dispatch tail
    (docs/TPU_NOTES.md 'Dispatch tail').

    extras: additional (tq, cls) i32/f32 planes gathered at the winning
    lane (the keep2 runner-up state). Returns (m (tq, kb) f32,
    r (tq, kb) i32, *gathered extras)."""
    tq = sm.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, cls), 1)
    m_cols, r_cols = [], []
    e_cols = [[] for _ in extras]
    for _ in range(kb):
        best = jnp.max(sm, axis=1, keepdims=True)
        is_best = sm >= best
        fl = jnp.min(jnp.where(is_best, lane, cls), axis=1, keepdims=True)
        first = lane == fl
        m_cols.append(best)
        r_cols.append(jnp.sum(jnp.where(first, rows, 0), axis=1,
                              keepdims=True))
        for i, e in enumerate(extras):
            e_cols[i].append(jnp.sum(
                jnp.where(first, e, jnp.zeros_like(e)), axis=1,
                keepdims=True,
            ))
        sm = jnp.where(first, -3e38, sm)
    out = [jnp.concatenate(m_cols, 1), jnp.concatenate(r_cols, 1)]
    out.extend(jnp.concatenate(c, 1) for c in e_cols)
    return tuple(out)


def _kernel_topk(q_ref, ext_hbm, m_ref, r_ref, *, n_pad: int, tn: int,
                 cls: int, kb: int):
    """v5: the v3 class-max sweep + fused exact top-kb epilogue."""
    num_chunks = n_pad // tn
    members = tn // cls
    tq = q_ref.shape[0]

    def body(sm_ref, sr_ref, buf_ref, sem_ref):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                ext_hbm.at[pl.ds(chunk * tn, tn), :],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        get_dma(0, 0).start()
        q = q_ref[:]
        sm_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        sr_ref[:] = jnp.zeros((tq, cls), jnp.int32)

        def step(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            blk = buf_ref[slot]
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dd = dots.reshape(tq, members, cls)
            sm, sr = sm_ref[:], sr_ref[:]
            for m in range(members):
                cur = dd[:, m, :]
                better = cur > sm
                sm = jnp.where(better, cur, sm)
                sr = jnp.where(better, c * members + m, sr)
            sm_ref[:] = sm
            sr_ref[:] = sr
            return _

        jax.lax.fori_loop(0, num_chunks, step, None)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, cls), 1)
        rows = sr_ref[:] * cls + lane
        m_ref[:], r_ref[:] = _topk_epilogue(sm_ref[:], rows, kb, cls)

    pl.run_scoped(
        body,
        sm_ref=pltpu.VMEM((tq, cls), jnp.float32),
        sr_ref=pltpu.VMEM((tq, cls), jnp.int32),
        buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), jnp.bfloat16),
        sem_ref=pltpu.SemaphoreType.DMA((2,)),
    )


def _kernel2_topk(q_ref, ext_hbm, m_ref, r_ref, m2_ref, r2_ref, *,
                  n_pad: int, tn: int, cls: int, kb: int):
    """v5 keep2: the v4 sweep + fused top-kb; the runner-up planes are
    gathered at the same winning lanes (fast_flat_search concatenates
    winner + runner-up candidates exactly as the unfused path)."""
    num_chunks = n_pad // tn
    members = tn // cls
    tq = q_ref.shape[0]

    def body(sm_ref, sr_ref, sm2_ref, sr2_ref, buf_ref, sem_ref):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                ext_hbm.at[pl.ds(chunk * tn, tn), :],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        get_dma(0, 0).start()
        q = q_ref[:]
        sm_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        sr_ref[:] = jnp.zeros((tq, cls), jnp.int32)
        sm2_ref[:] = jnp.full((tq, cls), -3e38, jnp.float32)
        sr2_ref[:] = jnp.zeros((tq, cls), jnp.int32)

        def step(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            blk = buf_ref[slot]
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dd = dots.reshape(tq, members, cls)
            sm, sr = sm_ref[:], sr_ref[:]
            sm2, sr2 = sm2_ref[:], sr2_ref[:]
            for m in range(members):
                cur = dd[:, m, :]
                code = c * members + m
                win = cur > sm
                second = (cur > sm2) & ~win
                sm2 = jnp.where(win, sm, jnp.where(second, cur, sm2))
                sr2 = jnp.where(win, sr, jnp.where(second, code, sr2))
                sm = jnp.where(win, cur, sm)
                sr = jnp.where(win, code, sr)
            sm_ref[:], sr_ref[:] = sm, sr
            sm2_ref[:], sr2_ref[:] = sm2, sr2
            return _

        jax.lax.fori_loop(0, num_chunks, step, None)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, cls), 1)
        rows = sr_ref[:] * cls + lane
        rows2 = sr2_ref[:] * cls + lane
        m_ref[:], r_ref[:], m2_ref[:], r2_ref[:] = _topk_epilogue(
            sm_ref[:], rows, kb, cls, extras=(sm2_ref[:], rows2)
        )

    pl.run_scoped(
        body,
        sm_ref=pltpu.VMEM((tq, cls), jnp.float32),
        sr_ref=pltpu.VMEM((tq, cls), jnp.int32),
        sm2_ref=pltpu.VMEM((tq, cls), jnp.float32),
        sr2_ref=pltpu.VMEM((tq, cls), jnp.int32),
        buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), jnp.bfloat16),
        sem_ref=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("kb", "tq", "tn", "cls", "interpret"))
def classmax_topk_scan(
    ext: jnp.ndarray,
    q_ext: jnp.ndarray,
    *,
    kb: int,
    tq: int = 1024,
    tn: int = TN,
    cls: int = CLS,
    interpret: bool = False,
):
    """Fused scan + select: returns (best (B, kb) f32, rows (B, kb) i32),
    identical to classmax_scan followed by lax.top_k + take_along_axis."""
    n_pad, dp = ext.shape
    B = q_ext.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0 and kb <= cls
    spec = pl.BlockSpec((tq, kb), lambda i: (i, 0))
    return pl.pallas_call(
        partial(_kernel_topk, n_pad=n_pad, tn=tn, cls=cls, kb=kb),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, kb), jnp.float32),
            jax.ShapeDtypeStruct((B, kb), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_ext, ext)


@partial(jax.jit, static_argnames=("kb", "tq", "tn", "cls", "interpret"))
def classmax2_topk_scan(
    ext: jnp.ndarray,
    q_ext: jnp.ndarray,
    *,
    kb: int,
    tq: int = 512,
    tn: int = TN,
    cls: int = CLS,
    interpret: bool = False,
):
    """Fused keep2 scan + select: returns (best (B, kb), rows (B, kb),
    best2 (B, kb), rows2 (B, kb)) — the v4 outputs pre-gathered at the
    selected classes."""
    n_pad, dp = ext.shape
    B = q_ext.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0 and kb <= cls
    spec = pl.BlockSpec((tq, kb), lambda i: (i, 0))
    return pl.pallas_call(
        partial(_kernel2_topk, n_pad=n_pad, tn=tn, cls=cls, kb=kb),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dp), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, kb), jnp.float32),
            jax.ShapeDtypeStruct((B, kb), jnp.int32),
            jax.ShapeDtypeStruct((B, kb), jnp.float32),
            jax.ShapeDtypeStruct((B, kb), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q_ext, ext)
