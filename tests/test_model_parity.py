"""Parity: compact builder + jit encoder vs the reference-semantics oracle
on identical sampled subgraphs (the BASELINE.json allclose bar)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphsage_tpu.data import CSRGraph, synthetic_power_law
from graphsage_tpu.models import (
    GraphSageConfig,
    graphsage_apply,
    init_graphsage,
)
from graphsage_tpu.sampler import build_compact_batch
from graphsage_tpu.sampler.compact import sample_neighbor_sets

from tests.reference_oracle import oracle_forward


def make_graph(rng, n=60, extra_edges=150):
    # ring (guarantees deg>=2 everywhere) + random chords
    src = np.arange(n)
    dst = (src + 1) % n
    es = rng.randint(0, n, size=extra_edges)
    ed = rng.randint(0, n, size=extra_edges)
    keep = es != ed
    return CSRGraph.from_edges(n, np.concatenate([src, es[keep]]),
                               np.concatenate([dst, ed[keep]]))


@pytest.mark.parametrize("gcn", [False, True])
@pytest.mark.parametrize("agg", ["MEAN", "MAX"])
@pytest.mark.parametrize("num_layers", [1, 2, 3])
def test_forward_matches_oracle(gcn, agg, num_layers):
    rng = np.random.RandomState(42)
    graph = make_graph(rng)
    n, d, hidden = graph.num_nodes, 12, 16
    feats = rng.randn(n, d).astype(np.float32)

    cfg = GraphSageConfig(num_layers=num_layers, input_size=d,
                          out_size=hidden, gcn=gcn, agg_func=agg)
    params = init_graphsage(jax.random.PRNGKey(0), cfg)

    batch = rng.choice(n, size=9, replace=False).tolist()

    # record sample sets once, replay into both implementations
    sample_sets = []
    lower = list(batch)
    srng = np.random.RandomState(7)
    for _ in range(num_layers):
        s = sample_neighbor_sets(graph, lower, srng, fanout=4)
        sample_sets.append(s)
        union, seen = [], set()
        for ss in s:
            for x in sorted(ss):
                if x not in seen:
                    seen.add(x)
                    union.append(x)
        lower = union

    cb = build_compact_batch(graph, np.array(batch),
                             np.random.RandomState(0), num_layers=num_layers,
                             fanout=4, gcn=gcn, sample_sets=sample_sets,
                             bucket=True)
    x0 = jnp.asarray(feats)[jnp.asarray(cb.x0_ids)]
    frontiers = jax.tree.map(jnp.asarray, list(cb.frontiers))
    out = np.asarray(graphsage_apply(params, cfg, x0, frontiers))

    weights = [np.asarray(l["weight"]) for l in params["layers"]]
    want = oracle_forward(feats, weights, batch, sample_sets, gcn=gcn,
                          agg=agg)["acts"][-1]

    np.testing.assert_allclose(out[:len(batch)], want, rtol=1e-4, atol=1e-4)


def test_compact_batch_shapes_bucketed():
    rng = np.random.RandomState(0)
    graph = make_graph(rng)
    cb = build_compact_batch(graph, np.arange(5), rng, num_layers=2,
                             fanout=4, bucket=True)
    for f in cb.frontiers:
        u = f.idx.shape[0]
        assert u & (u - 1) == 0  # power of two
        assert f.idx.shape[1] == 5  # fanout + self slot
    assert cb.out_rows >= cb.batch_size


def test_dense_device_sampler_semantics():
    """Device sampler: valid counts = min(deg, K), no replacement, no self
    in aggregation mask (non-gcn), all sampled ids are real neighbors."""
    import jax

    from graphsage_tpu.sampler import sample_frontiers_dense

    rng = np.random.RandomState(3)
    graph = make_graph(rng)
    pad = graph.to_padded()
    batch = jnp.asarray(rng.choice(graph.num_nodes, 8, replace=False))
    x0_ids, frontiers = sample_frontiers_dense(
        jax.random.PRNGKey(1), jnp.asarray(pad.neighbors),
        jnp.asarray(pad.degrees), batch, num_layers=2, fanout=4)
    x0_ids = np.asarray(x0_ids)
    assert x0_ids.shape == (8 * 5 * 5,)

    # level-1 frontier nodes (children of batch)
    k = 4
    top = frontiers[-1]
    mask = np.asarray(top.mask)
    batch_np = np.asarray(batch)
    level1 = x0_ids.reshape(8 * 5, 5)[:, 0].reshape(8, 5)  # self cols
    assert np.array_equal(level1[:, 0], batch_np)
    for r in range(8):
        v = batch_np[r]
        neigh = set(graph.neighbors(v).tolist())
        deg = len(neigh)
        valid = mask[r]
        assert valid[0] == 0  # self slot masked (non-gcn)
        n_valid = int(valid[1:].sum())
        sampled = level1[r, 1:]
        sampled_valid = sampled[valid[1:] > 0]
        # no replacement
        assert len(set(sampled_valid.tolist())) == n_valid
        assert n_valid == min(deg, k) - (1 if v in neigh else 0) or \
            n_valid == min(deg, k)
        for s in sampled_valid:
            assert int(s) in neigh
