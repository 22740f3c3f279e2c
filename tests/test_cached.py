"""Leaf-cached pipeline (train/cached.py): exactness under take-all,
learning, gcn mix-in, and unsup step smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.data import CSRGraph, synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.sampler import PairSampler
from graphsage_tpu.train.cached import (
    cached_forward,
    make_cached_sup_epoch,
    make_cached_unsup_step,
    refresh_leaf_cache,
)
from graphsage_tpu.train.dense import dense_forward
from graphsage_tpu.train.trainer import _pair_tensors


def _small_graph(rng, n=40):
    src = np.concatenate([np.arange(n), rng.randint(0, n, 60)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.randint(0, n, 60)])
    keep = src != dst
    return CSRGraph.from_edges(n, src[keep], dst[keep])


@pytest.mark.parametrize("agg", ["MEAN", "MAX"])
@pytest.mark.parametrize("gcn", [False, True])
def test_cached_equals_dense_under_takeall(gcn, agg):
    """With fanout >= max degree both pipelines are deterministic
    (take-all), so cached_forward must equal dense_forward exactly —
    for MEAN and for the elementwise-MAX cache alike."""
    rng = np.random.RandomState(0)
    n, d, h = 40, 8, 6
    g = _small_graph(rng, n)
    feats = jnp.asarray(rng.randn(n, d).astype(np.float32))
    fanout = int(g.degrees.max()) + 1
    pad = g.to_padded()

    mcfg = GraphSageConfig(num_layers=2, input_size=d, out_size=h, gcn=gcn,
                           agg_func=agg)
    params = {"sage": init_graphsage(jax.random.PRNGKey(3), mcfg)}
    batch = jnp.asarray(rng.choice(n, 7, replace=False).astype(np.int32))
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)

    dense_out = dense_forward(params, mcfg, feats, neighbors, degrees,
                              batch, jax.random.PRNGKey(5), fanout=fanout)
    cache_feats, cnt = refresh_leaf_cache(jax.random.PRNGKey(6), feats,
                                          neighbors, degrees, fanout, agg=agg)
    cached_out = cached_forward(params, mcfg, feats, cache_feats, cnt,
                                neighbors, degrees, batch,
                                jax.random.PRNGKey(7), fanout=fanout)
    np.testing.assert_allclose(np.asarray(cached_out), np.asarray(dense_out),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("agg", ["MEAN", "MAX"])
def test_refresh_chunked_matches_single_shot(agg):
    """A tiny max_gather_bytes forces the lax.scan block path; under
    take-all fanout (RNG-independent sampling) it must equal the
    single-shot refresh exactly, including the clamped tail block."""
    rng = np.random.RandomState(1)
    n, d = 53, 8  # prime n: exercises an uneven tail block
    g = _small_graph(rng, n)
    feats = jnp.asarray(rng.randn(n, d).astype(np.float32))
    fanout = int(g.degrees.max()) + 1
    pad = g.to_padded()
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)

    full_f, full_c = refresh_leaf_cache(jax.random.PRNGKey(9), feats,
                                        neighbors, degrees, fanout, agg=agg)
    # block=16 over n=53 -> 4 scan blocks with an uneven clamped tail
    chunk_f, chunk_c = refresh_leaf_cache(
        jax.random.PRNGKey(9), feats, neighbors, degrees, fanout, agg=agg,
        block=16)
    np.testing.assert_allclose(np.asarray(chunk_f), np.asarray(full_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(chunk_c), np.asarray(full_c))


def test_cached_max_epoch_learns():
    """The MAX leaf cache trains end-to-end through the epoch driver."""
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4, seed=4)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16,
                           agg_func="MAX")
    key = jax.random.PRNGKey(0)
    params = {"sage": init_graphsage(key, mcfg),
              "clf": init_classifier(key, 16, 4)}
    epoch_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=4, lr=0.3))
    rng = np.random.RandomState(0)
    batches = jnp.asarray(rng.choice(ds.train_nodes, (12, 32)).astype(np.int32))
    labels = jnp.asarray(ds.labels)[batches]
    _, losses = epoch_fn(params, jnp.asarray(ds.features),
                         jnp.asarray(pad.neighbors),
                         jnp.asarray(pad.degrees), batches, labels,
                         jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cached_epoch_learns():
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4, seed=4)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    key = jax.random.PRNGKey(0)
    params = {"sage": init_graphsage(key, mcfg),
              "clf": init_classifier(key, 16, 4)}
    epoch_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=4, lr=0.3))
    rng = np.random.RandomState(0)
    t, b = 12, 32
    batches = jnp.asarray(rng.choice(ds.train_nodes, (t, b)).astype(np.int32))
    labels = jnp.asarray(ds.labels)[batches]
    params2, losses = epoch_fn(params, jnp.asarray(ds.features),
                               jnp.asarray(pad.neighbors),
                               jnp.asarray(pad.degrees), batches, labels,
                               jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # no scatter in the compiled program: the backward of the leaf level
    # reads constant tables only
    text = jax.jit(epoch_fn).lower(
        params, jnp.asarray(ds.features), jnp.asarray(pad.neighbors),
        jnp.asarray(pad.degrees), batches, labels,
        jax.random.PRNGKey(1)).as_text()
    assert "scatter" not in text.lower()


def test_cached_unsup_step():
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4, seed=4)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    key = jax.random.PRNGKey(0)
    params = {"sage": init_graphsage(key, mcfg),
              "clf": init_classifier(key, 16, 4)}
    ps = PairSampler(ds.graph, ds.train_nodes)
    rng = np.random.RandomState(1)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), 16)]
    pb = ps.sample_batch(batch, num_neg=20, rng=rng)
    ext = pb.unique_nodes
    mean_feats, cnt = refresh_leaf_cache(
        jax.random.PRNGKey(2), jnp.asarray(ds.features),
        jnp.asarray(pad.neighbors), jnp.asarray(pad.degrees), 4)
    step = jax.jit(make_cached_unsup_step(mcfg, fanout=4, lr=0.1,
                                          learn_method="plus_unsup"))
    labels = jnp.asarray(ds.labels)[jnp.asarray(ext)]
    p2, loss = step(params, jnp.asarray(ds.features), mean_feats, cnt,
                    jnp.asarray(pad.neighbors), jnp.asarray(pad.degrees),
                    jnp.asarray(ext), labels, _pair_tensors(pb),
                    jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    d0 = np.abs(np.asarray(p2["sage"]["layers"][0]["weight"])
                - np.asarray(params["sage"]["layers"][0]["weight"])).max()
    assert d0 > 0
