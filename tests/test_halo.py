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
        jax.device_put(jnp.asarray(plan.addr_is_local), sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.addr_local), sh(P("data", None))),
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
        jax.device_put(jnp.asarray(plan.addr_is_local), sh(P("data", None))),
        jax.device_put(jnp.asarray(plan.addr_local), sh(P("data", None))),
    )
    got = np.asarray(out).reshape(ids.shape[0], ids.shape[1], d)
    np.testing.assert_allclose(got, feats[ids], atol=0)


def test_locality_reorder_shrinks_halo_cap(mesh):
    """BFS reordering + local bypass: the request cap (halo payload) must
    shrink versus scattered node ids on a community graph."""
    from graphsage_tpu.parallel.partition import bfs_reorder, relabel_graph
    from tests.test_partition import community_graph

    rng = np.random.RandomState(4)
    g = community_graph(rng)
    n_dev = 8
    # frontier = each device's community-ish node block neighbors
    ids = rng.randint(0, g.num_nodes, size=(n_dev, 64))
    plan_scattered = plan_halo(ids, g.num_nodes, n_dev)

    perm = bfs_reorder(g)
    g2 = relabel_graph(g, perm)
    rows_per = (g2.num_nodes + n_dev - 1) // n_dev
    # frontier with locality: each device asks for neighbors of ITS range
    ids2 = np.zeros((n_dev, 64), np.int64)
    for d in range(n_dev):
        own = np.arange(d * rows_per, min((d + 1) * rows_per, g2.num_nodes))
        cand = np.unique(np.concatenate(
            [g2.neighbors(int(v)) for v in own[:20]] + [own[:8]]))
        ids2[d] = cand[rng.randint(0, len(cand), 64)]
    plan_local = plan_halo(ids2, g2.num_nodes, n_dev)

    def remote_volume(plan):
        # distinct remote (owner, slot) requests actually addressed
        total = 0
        for r in range(n_dev):
            sel = plan.addr_is_local[r] == 0
            keys = (plan.addr_owner[r][sel].astype(np.int64) * 10**6
                    + plan.addr_slot[r][sel])
            total += len(np.unique(keys))
        return total

    # locality cuts the number of rows that must ride the collective
    assert remote_volume(plan_local) < 0.8 * remote_volume(plan_scattered), (
        remote_volume(plan_local), remote_volume(plan_scattered))
    # far more slots are local after reorder than with scattered ids
    assert (plan_local.addr_is_local.mean()
            > 2 * plan_scattered.addr_is_local.mean())
