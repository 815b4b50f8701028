"""Pallas row-gather kernel: pipelined per-row DMA from HBM.

The HNSW traversal's hot op is "fetch K neighbor rows per query" — the
reference does it with one-sided RDMA READs hidden by coroutines
(/root/reference/src/rdma/rdma_reads.hh, scheduler.hh). XLA's dynamic
gather lowering runs far below HBM speed inside traversal loops on this
backend (measured ~15x off speed-of-light), so this kernel reimplements
the fetch the way the hardware wants it: scalar-prefetched row indices
(SMEM) drive a ring of `Q` outstanding async DMA copies HBM->VMEM — the
same latency-hiding structure as the reference's coroutine ring
(N in-flight READs per thread), one level down the memory hierarchy.

Rows must be -1-free (clamp + mask upstream); the caller masks results.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OUTSTANDING = 8  # in-flight DMAs (cf. reference --coroutines=4/thread)

# Mosaic tiles 1-D HBM memrefs in 1024-element chunks on this backend, and
# dynamic slices must be tile-aligned (measured on the v5e: "Slice shape
# along dimension 0 must be aligned to tiling (1024)"). So the flat-layout
# row gather needs dp % 1024 == 0 — natural for GIST-class d≈960 rows
# (pad 961 -> 1024, 6% waste), an 8x bandwidth tax at d=128.
FLAT_ALIGN = 1024


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, blk: int):
    i = pl.program_id(0)
    base = i * blk

    def start(j):
        idx = ids_ref[base + j]
        pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[j], sems.at[j % _OUTSTANDING]
        ).start()

    def wait(j):
        idx = ids_ref[base + j]
        pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[j], sems.at[j % _OUTSTANDING]
        ).wait()

    # warm the ring
    for j in range(min(_OUTSTANDING, blk)):
        start(j)

    def body(j, _):
        @pl.when(j + _OUTSTANDING < blk)
        def _():
            start(j + _OUTSTANDING)

        wait(j)
        return _

    jax.lax.fori_loop(0, blk, body, None)


@partial(jax.jit, static_argnames=("blk", "interpret"))
def gather_rows_pallas(
    table: jnp.ndarray,  # (N, d) any dtype, resident in HBM
    ids: jnp.ndarray,  # (R,) int32, must be in [0, N)
    *,
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns table[ids] (R, d) via pipelined row DMAs."""
    (R,) = ids.shape
    N, d = table.shape
    R_pad = -(-R // blk) * blk
    ids_pad = jnp.concatenate(
        [ids, jnp.zeros((R_pad - R,), jnp.int32)]
    ) if R_pad != R else ids
    ids_pad = jnp.clip(ids_pad, 0, N - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (blk, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_OUTSTANDING,))],
    )
    out = pl.pallas_call(
        partial(_gather_kernel, blk=blk),
        out_shape=jax.ShapeDtypeStruct((R_pad, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids_pad, table)
    return out[:R]


def _gather_kernel_flat(ids_ref, table_ref, out_ref, sems, *, blk: int, dp: int):
    """1-D table variant: row r lives at [r*dp, (r+1)*dp) of a flat array.

    Dodges the (8, 128) tiled-slice constraint that forbids single-row
    slices of a 2-D HBM memref (docs/TPU_NOTES.md): 1-D buffers tile in
    FLAT_ALIGN-element chunks, so dp-sized slices at dp-multiples are
    legal on BOTH ends of the copy (the output block is 1-D too — a 2-D
    VMEM destination would hit the same sub-8-row wall).
    """
    i = pl.program_id(0)
    base = i * blk

    def mk(j):
        idx = ids_ref[base + j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx * dp, dp)],
            out_ref.at[pl.ds(j * dp, dp)],
            sems.at[j % _OUTSTANDING],
        )

    for j in range(min(_OUTSTANDING, blk)):
        mk(j).start()

    def body(j, _):
        @pl.when(j + _OUTSTANDING < blk)
        def _():
            mk(j + _OUTSTANDING).start()

        mk(j).wait()
        return _

    jax.lax.fori_loop(0, blk, body, None)


@partial(jax.jit, static_argnames=("blk", "interpret"))
def gather_rows_pallas_flat(
    table: jnp.ndarray,  # (N, d); d should be a multiple of 128
    ids: jnp.ndarray,  # (R,) int32 in [0, N)
    *,
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """table[ids] via row DMAs over a flattened 1-D view of the table."""
    (R,) = ids.shape
    N, dp = table.shape
    R_pad = -(-R // blk) * blk
    ids_pad = (
        jnp.concatenate([ids, jnp.zeros((R_pad - R,), jnp.int32)])
        if R_pad != R
        else ids
    )
    ids_pad = jnp.clip(ids_pad, 0, N - 1)
    flat = table.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (blk * dp,), lambda i, *_: (i,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_OUTSTANDING,))],
    )
    out = pl.pallas_call(
        partial(_gather_kernel_flat, blk=blk, dp=dp),
        out_shape=jax.ShapeDtypeStruct((R_pad * dp,), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids_pad, flat)
    return out.reshape(R_pad, dp)[:R]
