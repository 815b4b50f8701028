"""Fused class-max scan, split layout: components + f32 aux side-table.

The v3/v4 kernels (pallas_scan3.py) score against a packed bf16 "ext"
row [2v | c0 | c1] whose norm columns force dp = next_mult_128(d + 2) —
a 2x layout tax at d % 128 == 0 (the (8,128) tiling pads 130 lanes to
256; the same tax the r3 HNSW graph fix removed, docs/TPU_NOTES.md).
This generation splits the score into

    score(row) = scl[row] * <q, comp[row]> + nrm[row]

with comp a LANE-EXACT (N, d_pad128) table (bf16 *or int8*) and
(nrm, scl) one f32 each per row, applied on the VPU after the MXU dot:

  * bf16 comp: scl = 2, nrm = -||v_bf16||^2 (f32 — strictly more norm
    precision than the residual-encoded bf16 column pair). At d=128 the
    row shrinks 512 B -> 264 B: ~2x capacity AND ~2x less MXU work per
    row (the scan is compute-bound at ~88% of bf16 peak).
  * int8 comp: per-row symmetric quantization v ~ comp * s/127,
    scl = 2s/127, nrm = -||v_q||^2 -> 136 B/row, ~3.8x today's
    capacity (~60-80M rows/chip at d=128). The MXU dot runs on the
    int8 values converted to bf16 in VMEM (exactly representable), so
    int8 here buys *bytes*, not a precision-risky int pipeline; the
    measured int8 MXU rate on this part is only ~1.1x bf16 anyway
    (scripts/on_chip_int8_probe.py).

The aux table is stored (2, N_pad) f32 [0]=nrm [1]=scl and reshaped
(free, row-major) to (2, N_pad//cls, cls) at call time so each chunk's
slice lands as (2, members, cls) — row r = c*tn + m*cls + lane matches
aux[:, c*members + m, lane] with zero in-kernel relayout.

Reference analogue: the flat-scan family replaces the AVX2 distance
loop + heap (distance.hh:80-118, heap.hh) with one fused MXU sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shine_tpu.config import METRIC_L2
from shine_tpu.ops.distance import squared_norms

NEG = -3e38

# Split tables pad to 16384 rows: the aux chunk slice (2, members, cls)
# must keep members = tn/cls a multiple of 8 (Mosaic sublane tiling), so
# the scan runs at tn = 8*cls and n_pad must divide by it. 16384 covers
# tn for cls up to 2048 and costs at most ~4 MB of pad rows.
SPLIT_QUANTUM = 16384


def comp_width(dim: int) -> int:
    """Lane-padded component width (no norm columns)."""
    return -(-dim // 128) * 128


def _kernel_split(q_ref, comp_hbm, aux_hbm, m_ref, r_ref, *, n_pad: int,
                  tn: int, cls: int, keep2: bool, m2_ref=None, r2_ref=None,
                  kb: int = 0, o_refs=None, scratch=None):
    """kb=0: m_ref/r_ref (and the keep2 pair) are the (tq, cls) output
    refs. kb>0: they are VMEM scratch and the fused exact top-kb
    epilogue (ops/pallas_scan3.py:_topk_epilogue) writes (tq, kb)
    results into o_refs — the select and the (B, cls) HBM round-trip
    leave the dispatch tail, same trade as the v5 fastflat kernel.
    scratch: pre-allocated (buf, aux, sem, aux_sem) refs — the topk
    entry allocates everything in ONE run_scoped (nested scopes break
    interpret-mode discharge)."""
    num_chunks = n_pad // tn
    members = tn // cls

    def body(buf_ref, aux_ref, sem_ref, aux_sem):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                comp_hbm.at[pl.ds(chunk * tn, tn), :],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        def get_aux(slot, chunk):
            return pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(chunk * members, members), :],
                aux_ref.at[slot],
                aux_sem.at[slot],
            )

        get_dma(0, 0).start()
        get_aux(0, 0).start()
        q = q_ref[:]  # (TQ, dpc) bf16
        tq = q.shape[0]
        m_ref[:] = jnp.full((tq, cls), NEG, jnp.float32)
        r_ref[:] = jnp.zeros((tq, cls), jnp.int32)
        if keep2:
            m2_ref[:] = jnp.full((tq, cls), NEG, jnp.float32)
            r2_ref[:] = jnp.zeros((tq, cls), jnp.int32)

        def step(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(c + 1, 2), c + 1).start()
                get_aux(jax.lax.rem(c + 1, 2), c + 1).start()

            get_dma(slot, c).wait()
            get_aux(slot, c).wait()
            blk = buf_ref[slot].astype(jnp.bfloat16)  # int8 -> bf16 exact
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, TN)
            dd = dots.reshape(tq, members, cls)
            aux_c = aux_ref[slot]  # (2, members, cls) f32
            sm, sr = m_ref[:], r_ref[:]
            if keep2:
                sm2, sr2 = m2_ref[:], r2_ref[:]
            # Lean select: the row state holds the scalar member code
            # c*members + m (row = code*cls + lane, materialized ONCE
            # after the sweep) — the per-member row-vector arithmetic
            # was ~25% of the VPU select work that bounds this kernel
            # (docs/TPU_NOTES.md: the split scan is select-bound, not
            # MXU-bound). Scalar `code` broadcast in the where keeps
            # the same strict-> earliest-row-wins tie order.
            for m in range(members):
                cur = dd[:, m, :] * aux_c[1, m][None, :] + aux_c[0, m][None, :]
                code = c * members + m
                win = cur > sm
                if keep2:
                    second = (cur > sm2) & ~win
                    sm2 = jnp.where(win, sm, jnp.where(second, cur, sm2))
                    sr2 = jnp.where(win, sr, jnp.where(second, code, sr2))
                sm = jnp.where(win, cur, sm)
                sr = jnp.where(win, code, sr)
            m_ref[:], r_ref[:] = sm, sr
            if keep2:
                m2_ref[:], r2_ref[:] = sm2, sr2
            return _

        jax.lax.fori_loop(0, num_chunks, step, None)
        lane = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], cls), 1)
        if kb:
            from shine_tpu.ops.pallas_scan3 import _topk_epilogue

            rows = r_ref[:] * cls + lane
            if keep2:
                rows2 = r2_ref[:] * cls + lane
                om, orr, om2, or2 = o_refs
                om[:], orr[:], om2[:], or2[:] = _topk_epilogue(
                    m_ref[:], rows, kb, cls, extras=(m2_ref[:], rows2)
                )
            else:
                om, orr = o_refs
                om[:], orr[:] = _topk_epilogue(m_ref[:], rows, kb, cls)
        else:
            r_ref[:] = r_ref[:] * cls + lane
            if keep2:
                r2_ref[:] = r2_ref[:] * cls + lane

    if scratch is not None:
        body(*scratch)
    else:
        pl.run_scoped(
            body,
            buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), comp_hbm.dtype),
            aux_ref=pltpu.VMEM((2, 2, members, cls), jnp.float32),
            sem_ref=pltpu.SemaphoreType.DMA((2,)),
            aux_sem=pltpu.SemaphoreType.DMA((2,)),
        )


@partial(jax.jit, static_argnames=("tq", "tn", "cls", "keep2", "interpret"))
def classmax_scan_split(
    comp: jnp.ndarray,  # (N_pad, dpc) bf16 or int8, N_pad % tn == 0
    aux: jnp.ndarray,  # (2, N_pad) f32: [0]=nrm, [1]=scl
    q: jnp.ndarray,  # (B, dpc) bf16, B % tq == 0
    *,
    tq: int = 512,
    tn: int = 2048,
    cls: int = 1024,
    keep2: bool = False,
    interpret: bool = False,
):
    """Returns (best (B, cls) f32, rows (B, cls) i32[, best2, rows2])."""
    n_pad, dpc = comp.shape
    B = q.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0
    assert interpret or (tn // cls) % 8 == 0, (
        f"aux chunk needs tn/cls % 8 == 0 (Mosaic sublane tiling); "
        f"got tn={tn} cls={cls}"
    )
    assert aux.shape == (2, n_pad)
    aux3 = aux.reshape(2, n_pad // cls, cls)  # free row-major reshape
    spec = pl.BlockSpec((tq, cls), lambda i: (i, 0))
    n_out = 4 if keep2 else 2
    shp = [jax.ShapeDtypeStruct((B, cls), jnp.float32),
           jax.ShapeDtypeStruct((B, cls), jnp.int32)] * (n_out // 2)
    out = pl.pallas_call(
        partial(
            _kernel_split_entry, n_pad=n_pad, tn=tn, cls=cls, keep2=keep2
        ),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dpc), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec] * n_out,
        out_shape=shp,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, comp, aux3)
    return tuple(out)


def _kernel_split_topk_entry(q_ref, comp_hbm, aux_hbm, *out_refs, n_pad,
                             tn, cls, keep2, kb):
    tq = q_ref.shape[0]
    members = tn // cls
    dma = dict(
        buf_ref=pltpu.VMEM((2, tn, q_ref.shape[1]), comp_hbm.dtype),
        aux_ref=pltpu.VMEM((2, 2, members, cls), jnp.float32),
        sem_ref=pltpu.SemaphoreType.DMA((2,)),
        aux_sem=pltpu.SemaphoreType.DMA((2,)),
    )
    if keep2:
        def scoped(sm_ref, sr_ref, sm2_ref, sr2_ref, buf_ref, aux_ref,
                   sem_ref, aux_sem):
            _kernel_split(
                q_ref, comp_hbm, aux_hbm, sm_ref, sr_ref, n_pad=n_pad,
                tn=tn, cls=cls, keep2=True, m2_ref=sm2_ref, r2_ref=sr2_ref,
                kb=kb, o_refs=out_refs,
                scratch=(buf_ref, aux_ref, sem_ref, aux_sem),
            )

        pl.run_scoped(
            scoped,
            sm_ref=pltpu.VMEM((tq, cls), jnp.float32),
            sr_ref=pltpu.VMEM((tq, cls), jnp.int32),
            sm2_ref=pltpu.VMEM((tq, cls), jnp.float32),
            sr2_ref=pltpu.VMEM((tq, cls), jnp.int32),
            **dma,
        )
    else:
        def scoped(sm_ref, sr_ref, buf_ref, aux_ref, sem_ref, aux_sem):
            _kernel_split(
                q_ref, comp_hbm, aux_hbm, sm_ref, sr_ref, n_pad=n_pad,
                tn=tn, cls=cls, keep2=False, kb=kb, o_refs=out_refs,
                scratch=(buf_ref, aux_ref, sem_ref, aux_sem),
            )

        pl.run_scoped(
            scoped,
            sm_ref=pltpu.VMEM((tq, cls), jnp.float32),
            sr_ref=pltpu.VMEM((tq, cls), jnp.int32),
            **dma,
        )


@partial(jax.jit, static_argnames=("kb", "tq", "tn", "cls", "keep2",
                                   "interpret"))
def classmax_topk_scan_split(
    comp: jnp.ndarray,
    aux: jnp.ndarray,
    q: jnp.ndarray,
    *,
    kb: int,
    tq: int = 512,
    tn: int = 2048,
    cls: int = 1024,
    keep2: bool = False,
    interpret: bool = False,
):
    """Fused split scan + exact top-kb select: returns (best (B, kb),
    rows (B, kb)[, best2, rows2]) — identical to classmax_scan_split
    followed by lax.top_k + take_along_axis (tests/test_split.py)."""
    n_pad, dpc = comp.shape
    B = q.shape[0]
    assert n_pad % tn == 0 and B % tq == 0 and tn % cls == 0 and kb <= cls
    assert interpret or (tn // cls) % 8 == 0
    assert aux.shape == (2, n_pad)
    aux3 = aux.reshape(2, n_pad // cls, cls)
    spec = pl.BlockSpec((tq, kb), lambda i: (i, 0))
    n_out = 4 if keep2 else 2
    shp = [jax.ShapeDtypeStruct((B, kb), jnp.float32),
           jax.ShapeDtypeStruct((B, kb), jnp.int32)] * (n_out // 2)
    out = pl.pallas_call(
        partial(_kernel_split_topk_entry, n_pad=n_pad, tn=tn, cls=cls,
                keep2=keep2, kb=kb),
        grid=(B // tq,),
        in_specs=[
            pl.BlockSpec((tq, dpc), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec] * n_out,
        out_shape=shp,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, comp, aux3)
    return tuple(out)


def _kernel_split_entry(q_ref, comp_hbm, aux_hbm, *out_refs, n_pad, tn, cls,
                        keep2):
    if keep2:
        m_ref, r_ref, m2_ref, r2_ref = out_refs
        _kernel_split(q_ref, comp_hbm, aux_hbm, m_ref, r_ref, n_pad=n_pad,
                      tn=tn, cls=cls, keep2=True, m2_ref=m2_ref,
                      r2_ref=r2_ref)
    else:
        m_ref, r_ref = out_refs
        _kernel_split(q_ref, comp_hbm, aux_hbm, m_ref, r_ref, n_pad=n_pad,
                      tn=tn, cls=cls, keep2=False)


def pack_split_query(q: jnp.ndarray, dpc: int) -> jnp.ndarray:
    """Zero-pad queries to the component lane width; bf16."""
    B, d = q.shape
    if d == dpc:
        return q.astype(jnp.bfloat16)
    out = jnp.zeros((B, dpc), q.dtype)
    return out.at[:, :d].set(q).astype(jnp.bfloat16)


def pack_split_tables(
    v: np.ndarray, metric: int, n_pad: int, *, comp_dtype=np.float16
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side packing: (n, d) f32 -> (comp (n_pad, dpc), aux (2, n_pad)).

    comp_dtype: np.float16 sentinel means bf16 (numpy has no bf16; rows
    are rounded via jnp at upload), np.int8 means per-row symmetric int8.
    Pad rows get nrm = NEG so they can never win a class.
    """
    n, d = v.shape
    dpc = comp_width(d)
    aux = np.zeros((2, n_pad), np.float32)
    aux[0, n:] = NEG
    aux[1, :] = 1.0
    comp = np.zeros((n_pad, dpc),
                    np.int8 if comp_dtype == np.int8 else np.float32)
    if comp_dtype == np.int8:
        s = np.abs(v).max(axis=1)
        s = np.maximum(s, 1e-30)
        qv = np.clip(np.rint(v * (127.0 / s[:, None])), -127, 127)
        comp[:n, :d] = qv.astype(np.int8)
        vq = qv * (s[:, None] / 127.0)
        if metric == METRIC_L2:
            aux[1, :n] = 2.0 * s / 127.0
            aux[0, :n] = -np.sum(vq * vq, axis=1)
        else:
            aux[1, :n] = s / 127.0
    else:
        vb = np.asarray(jnp.asarray(v).astype(jnp.bfloat16).astype(
            jnp.float32))
        comp[:n, :d] = vb
        if metric == METRIC_L2:
            aux[1, :n] = 2.0
            aux[0, :n] = -np.sum(vb * vb, axis=1)
    return comp, aux


@partial(jax.jit, static_argnames=("metric", "dpc", "int8", "rchunk"))
def pack_split_device(v: jnp.ndarray, *, metric: int, dpc: int,
                      int8: bool = False, rchunk: int = 65536):
    """On-device split packing (device twin of pack_split_tables; callers
    guarantee n % 4096 == 0 so there are no pad rows)."""
    n, d = v.shape
    rchunk = min(rchunk, n)
    while n % rchunk:
        rchunk //= 2
    xs = v.reshape(n // rchunk, rchunk, d)

    def body(_, x):
        c = jnp.zeros((rchunk, dpc), jnp.float32)
        if int8:
            s = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30)
            qv = jnp.clip(jnp.rint(x * (127.0 / s[:, None])), -127, 127)
            c = c.at[:, :d].set(qv)
            vq = qv * (s[:, None] / 127.0)
            if metric == METRIC_L2:
                scl = 2.0 * s / 127.0
                # ranking norms: exact f32 contraction (ops/distance.py
                # squared_norms docstring — the XLA:TPU reduce-of-
                # multiply downcast hazard)
                nrm = -squared_norms(vq)
            else:
                scl = s / 127.0
                nrm = jnp.zeros_like(s)
            return None, (c.astype(jnp.int8), nrm, scl)
        xb = x.astype(jnp.bfloat16).astype(jnp.float32)
        c = c.at[:, :d].set(xb)
        if metric == METRIC_L2:
            nrm = -squared_norms(xb)
            scl = jnp.full((rchunk,), 2.0, jnp.float32)
        else:
            nrm = jnp.zeros((rchunk,), jnp.float32)
            scl = jnp.ones((rchunk,), jnp.float32)
        return None, (c.astype(jnp.bfloat16), nrm, scl)

    _, (comp, nrm, scl) = jax.lax.scan(body, None, xs)
    aux = jnp.stack([nrm.reshape(n), scl.reshape(n)])
    return comp.reshape(n, dpc), aux
