#!/usr/bin/env python
"""VERDICT #8: does int8 on the MXU beat the measured ~11 TF/s bf16 wall?

Two measurements on the real chip:
  1. raw matmul TF(ops)/s: bf16xbf16->f32 vs int8xint8->int32 at the scan's
     shape class (B x dp @ dp x N);
  2. a prototype int8-quantized exact-scan: per-vector symmetric int8
     quantization, int32 dot scores, top-kb, f32 re-rank — QPS + recall
     vs the bf16 fastflat scan at 200k x 128.

Timing via np.asarray(result) (docs/TPU_NOTES.md: block_until_ready does
not block on axon).
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


def t_s(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def raw_matmul(B=4096, K=512, N=262_144):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (B, K)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (N, K)).astype(np.int8))
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    # reduce over the full output (a slice would let XLA narrow the dot
    # to 8 columns and report fantasy TF/s)
    @jax.jit
    def mm_i8(a, b):
        d = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.max(d, axis=1)

    @jax.jit
    def mm_bf(a, b):
        d = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jnp.max(d, axis=1)

    flops = 2.0 * B * K * N
    s_bf = t_s(lambda: mm_bf(ab, bb))
    s_i8 = t_s(lambda: mm_i8(a8, b8))
    print(f"# raw matmul {B}x{K}x{N}:")
    print(f"#   bf16->f32 : {s_bf*1e3:8.2f} ms  ({flops/s_bf/1e12:.2f} TF/s)")
    print(f"#   int8->i32 : {s_i8*1e3:8.2f} ms  ({flops/s_i8/1e12:.2f} Top/s)")
    return flops / s_bf / 1e12, flops / s_i8 / 1e12


@partial(jax.jit, static_argnames=("k", "kb"))
def int8_scan(v8, scale, sq, vecs, sqn, q, *, k, kb):
    """Exact-ish L2 scan with int8 dots: ||q-v||^2 = ||q||^2 - 2<q,v> + ||v||^2.
    q quantized per-batch, v8 per-row symmetric; scores ranked in f32 from
    the int32 dots, survivors re-ranked exactly."""
    from shine_tpu.ops.distance import rerank_topk

    qmax = jnp.max(jnp.abs(q)) + 1e-9
    q8 = jnp.clip(jnp.round(q / qmax * 127.0), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        q8, v8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (B, N)
    dots_f = dots.astype(jnp.float32) * (qmax / 127.0) * scale[None, :]
    qn = jnp.sum(q * q, axis=-1)
    dd = qn[:, None] - 2.0 * dots_f + sq[None, :]
    _, cand = jax.lax.top_k(-dd, kb)
    return rerank_topk(vecs, sqn, q, cand, k, 0)


def int8_flat(n=200_000):
    from shine_tpu.io import Dataset, recall_at_k

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    z = np.load(os.path.join(cache_dir, "ds_200000x128_q10000.npz"))
    ds = Dataset(z["base"], z["queries"], z["gt"], name="synth")
    v = ds.base.astype(np.float32)
    scale_r = np.abs(v).max(axis=1) / 127.0 + 1e-12  # per-row symmetric
    v8 = np.clip(np.round(v / scale_r[:, None]), -127, 127).astype(np.int8)

    v8j = jnp.asarray(v8)
    scl = jnp.asarray(scale_r.astype(np.float32))
    sq = jnp.asarray((v * v).sum(-1).astype(np.float32))
    vecs = jnp.asarray(v)
    batch = 4096
    nq = len(ds.queries)
    qpad = np.zeros((-(-nq // batch) * batch, v.shape[1]), np.float32)
    qpad[:nq] = ds.queries
    qj = jnp.asarray(qpad)
    np.asarray(qj[:1])

    def run():
        outs = []
        for lo in range(0, len(qpad), batch):
            _, ii = int8_scan(
                v8j, scl, sq, vecs, sq,
                jax.lax.dynamic_slice_in_dim(qj, lo, batch, 0), k=10, kb=32,
            )
            outs.append(ii)
        return jnp.concatenate(outs)

    ids = np.asarray(run())  # compile
    t0 = time.perf_counter()
    ids = np.asarray(run())
    dt = time.perf_counter() - t0
    r = recall_at_k(ids[:nq], ds.ground_truth, 10)
    print(f"# int8 flat scan: qps={nq/dt:.0f} recall@10={r:.4f}")


if __name__ == "__main__":
    raw_matmul()
    int8_flat()
