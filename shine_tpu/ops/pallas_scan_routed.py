"""Routed class-max scan: cluster blocks gathered by scalar prefetch.

The flat split kernel (pallas_scan_split.py) streams the WHOLE table per
query tile — exact, but ~9.4-16.8 ns/row puts 100M rows at ~1-2k QPS.
This kernel scans only the clusters a query-tile group asked for: the
grid runs over G groups of T affinity-sorted queries, a prefetched
(G, P) column table (pltpu.PrefetchScalarGridSpec) drives double-
buffered DMAs of cluster-major blocks (cap rows each), and the same
lean class-max select keeps one (score, code) lane per class:

    per group g:  for p in range(P):
        block = comp[cols[g, p]*cap : +cap]          # async DMA
        score = scl * <q_tile, block> + nrm          # MXU + VPU
        class-max over (members, cls) lanes          # VPU select

Per scanned row the select touches T lanes instead of the full batch —
the routed scan's per-row cost is ~T/B of the flat kernel's on top of
reading ~P*cap rows per group instead of N.

Row coding matches the split kernel: local scan row l = code*cls + lane
with code = p*members + m, so the table row for a survivor is
cols[g, l // cap] * cap + (l % cap). Invalid columns point at a PAD
cluster (id C) whose aux nrm is NEG — its rows can never win a class,
so no in-kernel masking is needed and no real row is ever scanned twice
within a group (granted columns are distinct by construction).

Reference role: the DM-HNSW reference prunes its 100M search to ~ef*M
rows via graph traversal + one-sided READs of remote neighborhoods
(hnsw.hh:253-307, rdma_reads.hh:101-134); here pruning is coarse
clusters and the "READ batch" is the prefetched column table driving
block DMAs out of on-chip HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3e38


def _kernel_routed(cols_ref, q_ref, comp_hbm, aux_hbm, m_ref, r_ref,
                   buf_ref, aux_ref, sem_ref, aux_sem, *, P: int, cap: int,
                   cls: int, members: int):
    g = pl.program_id(0)

    def get_dma(slot, pidx):
        c = cols_ref[g, pidx]
        return pltpu.make_async_copy(
            comp_hbm.at[pl.ds(c * cap, cap), :],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    def get_aux(slot, pidx):
        c = cols_ref[g, pidx]
        return pltpu.make_async_copy(
            aux_hbm.at[c], aux_ref.at[slot], aux_sem.at[slot]
        )

    get_dma(0, 0).start()
    get_aux(0, 0).start()
    q = q_ref[:]  # (T, dpc) bf16
    tq = q.shape[0]
    m_ref[:] = jnp.full((tq, cls), NEG, jnp.float32)
    r_ref[:] = jnp.zeros((tq, cls), jnp.int32)

    def step(p, _):
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < P)
        def _():
            get_dma(jax.lax.rem(p + 1, 2), p + 1).start()
            get_aux(jax.lax.rem(p + 1, 2), p + 1).start()

        get_dma(slot, p).wait()
        get_aux(slot, p).wait()
        blk = buf_ref[slot].astype(jnp.bfloat16)  # int8 -> bf16 exact
        dots = jax.lax.dot_general(
            q, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, cap)
        dd = dots.reshape(tq, members, cls)
        aux_c = aux_ref[slot]  # (2*members, cls): [:members]=nrm, rest=scl
        sm, sr = m_ref[:], r_ref[:]
        for m in range(members):
            cur = dd[:, m, :] * aux_c[members + m][None, :] \
                + aux_c[m][None, :]
            code = p * members + m
            win = cur > sm
            sm = jnp.where(win, cur, sm)
            sr = jnp.where(win, code, sr)
        m_ref[:], r_ref[:] = sm, sr
        return _

    jax.lax.fori_loop(0, P, step, None)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, cls), 1)
    r_ref[:] = r_ref[:] * cls + lane


@partial(jax.jit, static_argnames=("T", "cap", "cls", "interpret"))
def routed_classmax_scan(
    comp: jnp.ndarray,  # ((C+1)*cap, dpc) int8|bf16 cluster-major
    aux_r: jnp.ndarray,  # (C+1, 2*members, cls) f32 nrm rows then scl rows
    q: jnp.ndarray,  # (B, dpc) bf16, B = G*T affinity-sorted
    cols: jnp.ndarray,  # (G, P) i32 cluster ids; invalid = C (pad cluster)
    *,
    T: int,
    cap: int,
    cls: int,
    interpret: bool = False,
):
    """Returns (best (B, cls) f32, code (B, cls) i32); survivor local row
    l = code*cls + lane maps to table row cols[g, l//cap]*cap + l%cap."""
    B, dpc = q.shape
    G, P = cols.shape
    assert B == G * T and cap % cls == 0
    members = cap // cls
    assert aux_r.shape[1] == 2 * members and aux_r.shape[2] == cls
    assert interpret or (2 * members) % 8 == 0, (
        f"aux cluster block needs 2*cap/cls % 8 == 0 (Mosaic sublane "
        f"tiling); got cap={cap} cls={cls}"
    )
    spec = pl.BlockSpec((T, cls), lambda g, cols_ref: (g, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T, dpc), lambda g, cols_ref: (g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[spec, spec],
        scratch_shapes=[
            pltpu.VMEM((2, cap, dpc), comp.dtype),
            pltpu.VMEM((2, 2 * members, cls), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel_routed, P=P, cap=cap, cls=cls, members=members),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, cls), jnp.float32),
            jax.ShapeDtypeStruct((B, cls), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cols, q, comp, aux_r)


def aux_routed_layout(aux: jnp.ndarray, C: int, cap: int, cls: int):
    """(2, C*cap) f32 flat aux -> (C, 2*members, cls) cluster-block aux."""
    members = cap // cls
    a = aux.reshape(2, C, members, cls)
    return jnp.moveaxis(a, 0, 1).reshape(C, 2 * members, cls)


def aux_routed_layout_chunk(aux_c: jnp.ndarray, cap: int, cls: int):
    """Per-chunk twin of aux_routed_layout: (2, rchunk) with rchunk a
    multiple of cap -> (rchunk//cap, 2*members, cls). Stacking chunk
    outputs reproduces aux_routed_layout of the concatenated flat aux
    exactly (tests/test_routed_split.py) — used inside the ingest scan
    so the flat (2, n_pad) aux and its transpose never coexist in HBM
    (at 100M the extra 0.85 GB copy on top of the 13.5 GB comp table
    was the ResourceExhausted margin)."""
    members = cap // cls
    rchunk = aux_c.shape[1]
    a = aux_c.reshape(2, rchunk // cap, members, cls)
    return jnp.moveaxis(a, 0, 1).reshape(rchunk // cap, 2 * members, cls)
