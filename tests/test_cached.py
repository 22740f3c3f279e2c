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


def test_cached_lstm_hybrid_matches_oracle_under_takeall():
    """The cached-LSTM hybrid (MEAN leaf cache at layer 1, live LSTM at
    layer 2 — train/cached.py docstring) against an explicit per-node
    oracle: take-all fanout makes every sampling op deterministic, so
    h1(v) = relu(W1·[x_v ‖ mean(x_neigh)]) and the layer-2 output is
    lstm_scan over the padded [self, n1..nK] sequence of h1 rows with the
    self slot masked (non-gcn)."""
    rng = np.random.RandomState(2)
    n, d, h = 40, 8, 8  # out_size == input so one LSTM cell size fits both
    g = _small_graph(rng, n)
    feats = jnp.asarray(rng.randn(n, d).astype(np.float32))
    fanout = int(g.degrees.max()) + 1
    pad = g.to_padded()
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)

    mcfg = GraphSageConfig(num_layers=2, input_size=d, out_size=h,
                           agg_func="LSTM")
    params = {"sage": init_graphsage(jax.random.PRNGKey(3), mcfg)}
    batch = rng.choice(n, 7, replace=False).astype(np.int32)

    cache_feats, cnt = refresh_leaf_cache(jax.random.PRNGKey(6), feats,
                                          neighbors, degrees, fanout,
                                          agg="LSTM")
    out = cached_forward(params, mcfg, feats, cache_feats, cnt, neighbors,
                         degrees, jnp.asarray(batch), jax.random.PRNGKey(7),
                         fanout=fanout)

    # oracle: layer 1 for every node (take-all mean over CSR neighbors)
    from graphsage_tpu.models.layers import sage_layer_apply
    from graphsage_tpu.models.lstm_agg import lstm_scan
    feats_np = np.asarray(feats)
    mean_np = np.zeros_like(feats_np)
    for v in range(n):
        nb = np.asarray(pad.neighbors[v][:pad.degrees[v]])
        nb = nb[nb != v]
        if len(nb):
            mean_np[v] = feats_np[nb].mean(axis=0)
    h1 = np.asarray(sage_layer_apply(params["sage"]["layers"][0],
                                     jnp.asarray(feats_np),
                                     jnp.asarray(mean_np), gcn=False))
    # layer 2: padded [self, n1..nK] sequence per batch node, self masked.
    # Slot ORDER is the sampler's random permutation (take-all still
    # permutes — the LSTM sequence order is the paper's randomization),
    # so the oracle replays the exact sampler call cached_forward makes
    # and checks the set separately.
    from graphsage_tpu.sampler.device import sample_frontiers_dense
    ids, _ = sample_frontiers_dense(jax.random.PRNGKey(7), neighbors,
                                    degrees, jnp.asarray(batch),
                                    num_layers=1, fanout=fanout)
    ids = np.asarray(ids).reshape(len(batch), fanout + 1)
    seqs = np.zeros((len(batch), fanout + 1, h), np.float32)
    mask = np.zeros((len(batch), fanout + 1), np.float32)
    for i, v in enumerate(batch):
        nb = np.asarray(pad.neighbors[v][:pad.degrees[v]])
        assert ids[i, 0] == v  # slot 0 = self
        deg = pad.degrees[v]
        assert set(ids[i, 1:1 + deg].tolist()) == set(nb.tolist())
        for s in range(1, fanout + 1):
            u = ids[i, s]
            if s <= deg:
                seqs[i, s] = h1[u]
                mask[i, s] = float(u != v)
        seqs[i, 0] = h1[v]
    agg = lstm_scan(params["sage"]["agg"][1], jnp.asarray(seqs),
                    jnp.asarray(mask))
    expect = sage_layer_apply(params["sage"]["layers"][1],
                              jnp.asarray(h1[batch]), agg, gcn=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_cached_lstm_hybrid_epoch_learns():
    """The hybrid trains through the scanned epoch driver: loss falls,
    the layer-2 LSTM cell receives gradient, the (unused) layer-1 cell
    does not."""
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4, seed=4)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16,
                           agg_func="LSTM")
    key = jax.random.PRNGKey(0)
    params = {"sage": init_graphsage(key, mcfg),
              "clf": init_classifier(key, 16, 4)}
    epoch_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=4, lr=0.3))
    rng = np.random.RandomState(0)
    batches = jnp.asarray(rng.choice(ds.train_nodes, (12, 32)).astype(np.int32))
    labels = jnp.asarray(ds.labels)[batches]
    params2, losses = epoch_fn(params, jnp.asarray(ds.features),
                               jnp.asarray(pad.neighbors),
                               jnp.asarray(pad.degrees), batches, labels,
                               jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    moved = np.abs(np.asarray(params2["sage"]["agg"][1]["w_ih"])
                   - np.asarray(params["sage"]["agg"][1]["w_ih"])).max()
    frozen = np.abs(np.asarray(params2["sage"]["agg"][0]["w_ih"])
                    - np.asarray(params["sage"]["agg"][0]["w_ih"])).max()
    assert moved > 0
    assert frozen == 0


def test_cached_trainer_lstm_requires_opt_in():
    """CachedTrainer rejects agg_func=LSTM without the explicit
    lstm_hybrid opt-in, and trains the hybrid protocol with it."""
    from graphsage_tpu.train import CachedTrainer, TrainConfig
    ds = synthetic_power_law(200, 1000, num_feats=12, num_classes=3, seed=6)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=12,
                           agg_func="LSTM")
    tcfg = TrainConfig(learn_method="sup", b_sz=32, epochs=1, seed=1,
                       fanout=4, verbose=False)
    with pytest.raises(ValueError, match="lstm_hybrid"):
        CachedTrainer(ds, mcfg, tcfg)
    tr = CachedTrainer(ds, mcfg, tcfg, lstm_hybrid=True)
    tr.fit()
    assert np.isfinite(tr.max_vali_f1)
    assert tr.max_vali_f1 > 0


def test_reuse_epoch_matches_fused_epoch_given_same_cache():
    """The reuse-epoch program (cache staleness, refresh_every>1) run with
    the cache the fused program would have drawn produces bit-identical
    params/losses: staleness changes WHEN the cache refreshes, never the
    step math."""
    from graphsage_tpu.train.cached import (make_cached_sup_epoch,
                                            make_cached_sup_epoch_reuse,
                                            refresh_leaf_cache)

    ds = synthetic_power_law(300, 1500, num_feats=12, num_classes=3, seed=0)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sage": init_graphsage(k1, mcfg),
              "clf": init_classifier(k2, 8, 3)}
    feats = jnp.asarray(ds.features)
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    rng = np.random.RandomState(0)
    batches = jnp.asarray(rng.randint(0, 300, (4, 32)).astype(np.int32))
    labels = jnp.take(jnp.asarray(ds.labels.astype(np.int32)), batches,
                      axis=0)
    key = jax.random.PRNGKey(9)

    fused = jax.jit(make_cached_sup_epoch(mcfg, fanout=4))
    p_a, loss_a = fused(params, feats, neighbors, degrees, batches, labels,
                        key)

    # replay the fused program's internal key split by hand
    k_cache, k_steps = jax.random.split(key)
    cache_feats, cache_count = refresh_leaf_cache(k_cache, feats, neighbors,
                                                  degrees, 4)
    reuse = jax.jit(make_cached_sup_epoch_reuse(mcfg, fanout=4))
    p_b, loss_b = reuse(params, feats, cache_feats, cache_count, neighbors,
                        degrees, batches, labels, k_steps)
    assert np.allclose(np.asarray(loss_a), np.asarray(loss_b))
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(p_a),
            jax.tree_util.tree_leaves_with_path(p_b)):
        assert np.allclose(np.asarray(va), np.asarray(vb)), ka


def test_cached_trainer_refresh_every_schedule():
    """refresh_every=3: the held cache is reused on epochs 1-2 and
    refreshed on 0 and 3; training still learns."""
    from graphsage_tpu.train import CachedTrainer, TrainConfig

    ds = synthetic_power_law(200, 900, num_feats=12, num_classes=3, seed=1)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    tcfg = TrainConfig(epochs=4, b_sz=32, fanout=4, seed=2, verbose=False,
                       refresh_every=3, clf_epochs=2)
    tr = CachedTrainer(ds, mcfg, tcfg, extend_batches=False)

    cache_ids = []
    for ep in range(4):
        tr.epoch = ep
        tr.train_epoch()
        cache_ids.append(id(tr._stale_cache[0]))
        tr.evaluate()
    # epochs 0-2 share one cache object; epoch 3 refreshed a new one
    assert cache_ids[0] == cache_ids[1] == cache_ids[2]
    assert cache_ids[3] != cache_ids[0]
    assert 0.0 <= tr.max_vali_f1 <= 1.0


def test_dist_reuse_epoch_matches_fused_given_same_cache():
    """Sharded staleness: refresh program + reuse-mode epoch reproduce the
    fused sharded epoch bit-for-bit when fed the cache it would have
    drawn (same key discipline as the single-device test above)."""
    from jax.sharding import Mesh

    from graphsage_tpu.train.cached_dist import (
        build_epoch_stack,
        make_cached_dist_epoch,
        make_cached_dist_refresh,
        pad_node_tables,
    )

    ds = synthetic_power_law(320, 1500, num_feats=12, num_classes=3, seed=0)
    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("data",))
    pad = ds.graph.to_padded()
    feats, neighbors, degrees = pad_node_tables(
        ds.features, pad.neighbors, pad.degrees, 4)
    feats, neighbors, degrees = (jnp.asarray(feats), jnp.asarray(neighbors),
                                 jnp.asarray(degrees))
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sage": init_graphsage(k1, mcfg),
              "clf": init_classifier(k2, 8, 3)}
    batches, labels, row_masks = build_epoch_stack(
        ds.train_nodes, ds.labels, 4, 32, np.random.RandomState(5))
    args = (jnp.asarray(batches), jnp.asarray(labels),
            jnp.asarray(row_masks))
    key = jax.random.PRNGKey(7)

    fused = make_cached_dist_epoch(mcfg, mesh, fanout=4)
    p_a, loss_a = fused(params, feats, neighbors, degrees, *args, key)

    k_cache, k_steps = jax.random.split(key)
    refresh = make_cached_dist_refresh(mcfg, mesh, fanout=4)
    cache, cnt = refresh(k_cache, feats, neighbors, degrees)
    reuse = make_cached_dist_epoch(mcfg, mesh, fanout=4, reuse_cache=True)
    p_b, loss_b = reuse(params, feats, neighbors, degrees, cache, cnt,
                        *args, k_steps)
    assert np.allclose(np.asarray(loss_a), np.asarray(loss_b))
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(p_a),
            jax.tree_util.tree_leaves_with_path(p_b)):
        assert np.allclose(np.asarray(va), np.asarray(vb)), ka


def test_cached_dist_trainer_refresh_every_runs():
    from graphsage_tpu.train import CachedDistTrainer, TrainConfig

    ds = synthetic_power_law(200, 900, num_feats=12, num_classes=3, seed=1)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    tcfg = TrainConfig(epochs=4, b_sz=32, fanout=4, refresh_every=3,
                       verbose=False, clf_epochs=2)
    tr = CachedDistTrainer(ds, mcfg, tcfg, extend_batches=False)
    cache_ids = []
    for ep in range(4):
        tr.epoch = ep
        tr.train_epoch()
        cache_ids.append(id(tr._dist_stale_cache[0]))
    assert cache_ids[0] == cache_ids[1] == cache_ids[2]
    assert cache_ids[3] != cache_ids[0]
