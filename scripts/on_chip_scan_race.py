#!/usr/bin/env python
"""Race scan architectures for the class-max sweep (the fastflat core).

Motivation: raw XLA dot measures ~30 TF/s on the v5e at scan shapes,
but the pallas v3 classmax kernel sustains ~11 TF/s — the hand-written
DMA/VPU pipeline is 3x off the compiler's matmul schedule. Candidates:

  A. pallas classmax_scan (shipped v3)
  B. one-shot XLA: (B,N) dot, reshape (B, N/cls, cls), max+argmax over
     the group axis (materializes B x N f32 — HBM-heavy but linear)
  C. lax.scan over N-chunks with a running (B, cls) classmax carry
     (the v3 structure, but XLA schedules the matmul)

All three must agree on (m, r) up to argmax ties.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t_ms(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@partial(jax.jit, static_argnames=("cls",))
def classmax_xla_oneshot(ext, q_ext, *, cls=1024):
    d = jax.lax.dot_general(
        q_ext, ext, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, N)
    B, N = d.shape
    dr = d.reshape(B, N // cls, cls)
    m = jnp.max(dr, axis=1)
    g = jnp.argmax(dr, axis=1).astype(jnp.int32)
    r = g * cls + jax.lax.broadcasted_iota(jnp.int32, (B, cls), 1)
    return m, r


@partial(jax.jit, static_argnames=("cls", "tn"))
def classmax_xla_scan(ext, q_ext, *, cls=1024, tn=32_768):
    N, dp = ext.shape
    B = q_ext.shape[0]
    chunks = ext.reshape(N // tn, tn, dp)

    def step(carry, blk):
        sm, sr, c = carry
        d = jax.lax.dot_general(
            q_ext, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, tn)
        dr = d.reshape(B, tn // cls, cls)
        m = jnp.max(dr, axis=1)
        g = jnp.argmax(dr, axis=1).astype(jnp.int32)
        r = c * tn + g * cls + jax.lax.broadcasted_iota(
            jnp.int32, (B, cls), 1
        )
        better = m > sm
        return (
            jnp.where(better, m, sm),
            jnp.where(better, r, sr),
            c + 1,
        ), None

    init = (
        jnp.full((B, cls), -3e38, jnp.float32),
        jnp.zeros((B, cls), jnp.int32),
        jnp.int32(0),
    )
    (sm, sr, _), _ = jax.lax.scan(step, init, chunks)
    return sm, sr


def main(n=200_000, d=128, B=4096):
    from shine_tpu.ops.pallas_scan import pack_ext_query, pack_ext_table
    from shine_tpu.ops.pallas_scan3 import classmax_scan

    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((B, d), dtype=np.float32)
    n_pad = -(-n // 4096) * 4096
    ext = jnp.asarray(pack_ext_table(v, 0, n_pad), jnp.bfloat16)
    q_ext = pack_ext_query(q, ext.shape[1]).astype(jnp.bfloat16)
    np.asarray(ext[:1])

    flops = 2.0 * B * n_pad * ext.shape[1]

    # download a scalar, not the (B, cls) f32 table — the dev tunnel moves
    # ~20 MB/s, so a 16 MB result would swamp a ~30 ms compute. sum() keeps
    # the full computation live (no DCE) and ships 4 bytes.
    @jax.jit
    def a_sum(e, qe):
        m, r = classmax_scan(e, qe, tq=512, tn=1024)
        return m.sum() + r.sum()

    @jax.jit
    def b_sum(e, qe):
        m, r = classmax_xla_oneshot(e, qe)
        return m.sum() + r.sum()

    ms_a = t_ms(lambda: a_sum(ext, q_ext))
    print(f"# A pallas v3 tq=512 : {ms_a:7.2f} ms ({flops/ms_a/1e9:.1f} TF/s)")
    ms_b = t_ms(lambda: b_sum(ext, q_ext))
    print(f"# B xla one-shot     : {ms_b:7.2f} ms ({flops/ms_b/1e9:.1f} TF/s)")
    for tn in (4096, 28_672):  # must divide n_pad = 2^12 * 7^2
        @jax.jit
        def c_sum(e, qe, tn=tn):
            m, r = classmax_xla_scan(e, qe, tn=tn)
            return m.sum() + r.sum()

        ms_c = t_ms(lambda: c_sum(ext, q_ext))
        print(
            f"# C xla scan tn={tn:6d}: {ms_c:7.2f} ms ({flops/ms_c/1e9:.1f} TF/s)"
        )

    # agreement (max scores must match exactly; rows up to ties)
    ma, ra = classmax_scan(ext, q_ext, tq=512, tn=1024)
    mb, rb = classmax_xla_oneshot(ext, q_ext)
    mc, rc = classmax_xla_scan(ext, q_ext, tn=4096)
    print(
        "# agree m: a-b", float(jnp.max(jnp.abs(ma - mb))),
        "a-c", float(jnp.max(jnp.abs(ma - mc))),
    )
    print(
        "# agree r: a-b", float((ra == rb).mean()), "a-c",
        float((ra == rc).mean()),
    )


if __name__ == "__main__":
    main()
