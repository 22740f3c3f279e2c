"""Halo exchange on the virtual 8-device CPU mesh: gathering arbitrary
global rows from an edge-partitioned feature table must equal a direct
gather from the unsharded table."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphsage_tpu.parallel.halo import (
    make_halo_gather,
    plan_halo,
    shard_features,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8])
    return Mesh(devs.reshape(8, 1)[:, 0], axis_names=("data",))


def test_halo_gather_matches_direct(mesh):
    rng = np.random.RandomState(0)
    n_dev = 8
    num_nodes, d = 103, 16  # deliberately not divisible by n_dev
    feats = rng.randn(num_nodes, d).astype(np.float32)
    b_loc = 24
    ids = rng.randint(0, num_nodes, size=(n_dev, b_loc))

    plan = plan_halo(ids, num_nodes, n_dev)
    feats_sh = shard_features(feats, n_dev)

    gather = make_halo_gather(mesh)
    sh = lambda spec: NamedSharding(mesh, spec)
    out = jax.jit(gather)(
        jax.device_put(jnp.asarray(feats_sh), sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.requests), sh(P("data", None, None))),
        jax.device_put(jnp.asarray(plan.addr_owner), sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.addr_slot), sh(P("data", None))),
    )
    got = np.asarray(out).reshape(n_dev, b_loc, d)
    want = feats[ids]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_halo_gather_duplicate_ids_collapse(mesh):
    """Duplicate frontier ids must resolve to the same served row, and the
    per-owner request cap reflects unique rows only."""
    rng = np.random.RandomState(1)
    n_dev = 8
    num_nodes, d = 64, 8
    feats = rng.randn(num_nodes, d).astype(np.float32)
    ids = np.tile(rng.randint(0, num_nodes, size=(n_dev, 4)), (1, 8))  # dups

    plan = plan_halo(ids, num_nodes, n_dev)
    assert plan.cap <= 16  # 4 unique ids per dev → cap stays small
    gather = make_halo_gather(mesh)
    sh = lambda spec: NamedSharding(mesh, spec)
    out = jax.jit(gather)(
        jax.device_put(jnp.asarray(shard_features(feats, n_dev)),
                       sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.requests), sh(P("data", None, None))),
        jax.device_put(jnp.asarray(plan.addr_owner), sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.addr_slot), sh(P("data", None))),
    )
    got = np.asarray(out).reshape(ids.shape[0], ids.shape[1], d)
    np.testing.assert_allclose(got, feats[ids], atol=0)
