"""Deterministic full-graph inference + serving bundles (graphsage_tpu.infer).

Oracle: explicit numpy layer-wise propagation replicating the reference
aggregation semantics over FULL neighbor sets (src/models.py:291-330 with
the sample = the whole adjacency row): per node, MEAN/MAX over neighbors
(minus self unless gcn, self unioned once in gcn), concat self, W, relu.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphsage_tpu.data.graph import CSRGraph
from graphsage_tpu.infer import (InferenceSession, export_bundle,
                                 full_graph_embeddings, load_bundle)
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import classifier_apply, init_classifier


def _random_graph(n=37, extra_edges=90, seed=3, self_loop=True):
    rng = np.random.RandomState(seed)
    # a ring (connected) + random chords; one explicit self-loop to check
    # the self-masking rule
    src = np.concatenate([np.arange(n), rng.randint(0, n, extra_edges)])
    dst = np.concatenate([(np.arange(n) + 1) % n,
                          rng.randint(0, n, extra_edges)])
    if self_loop:
        src = np.concatenate([src, [5]])
        dst = np.concatenate([dst, [5]])
    g = CSRGraph.from_edges(n, src, dst, undirected=True)
    feats = rng.randn(n, 12).astype(np.float32)
    return g, feats


def _numpy_oracle(params, cfg, feats, g: CSRGraph):
    h = feats.astype(np.float64)
    n = g.num_nodes
    for layer in range(cfg.num_layers):
        w = np.asarray(params["layers"][layer]["weight"], np.float64)
        out = np.zeros((n, w.shape[0]))
        for v in range(n):
            neigh = [u for u in g.neighbors(v) if u != v]
            members = ([v] + neigh) if cfg.gcn else neigh
            if members:
                rows = h[np.asarray(members)]
                agg = (rows.mean(0) if cfg.agg_func == "MEAN"
                       else rows.max(0))
            else:
                agg = np.zeros(h.shape[1])
            combined = agg if cfg.gcn else np.concatenate([h[v], agg])
            out[v] = np.maximum(combined @ w.T, 0.0)
        h = out
    return h


@pytest.mark.parametrize("gcn", [False, True])
@pytest.mark.parametrize("agg", ["MEAN", "MAX"])
def test_full_embed_matches_numpy_oracle(agg, gcn):
    g, feats = _random_graph()
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8,
                          agg_func=agg, gcn=gcn)
    params = init_graphsage(jax.random.PRNGKey(0), cfg)
    got = full_graph_embeddings(params, cfg, feats, g.to_padded())
    want = _numpy_oracle(jax.device_get(params), cfg, feats, g)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_blocking_invariance_and_determinism():
    g, feats = _random_graph(n=53, extra_edges=140, seed=7)
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    params = init_graphsage(jax.random.PRNGKey(1), cfg)
    pad = g.to_padded()
    a = full_graph_embeddings(params, cfg, feats, pad, block=7)
    b = full_graph_embeddings(params, cfg, feats, pad, block=None)
    c = full_graph_embeddings(params, cfg, feats, pad, block=None)
    np.testing.assert_array_equal(b, c)          # bit-identical reruns
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_lstm_full_embed_blocking_invariant_and_deterministic():
    g, feats = _random_graph(n=29, extra_edges=60, seed=11)
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8,
                          agg_func="LSTM")
    params = init_graphsage(jax.random.PRNGKey(2), cfg)
    pad = g.to_padded()
    a = full_graph_embeddings(params, cfg, feats, pad, block=5)
    b = full_graph_embeddings(params, cfg, feats, pad)
    c = full_graph_embeddings(params, cfg, feats, pad)
    np.testing.assert_array_equal(b, c)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert np.isfinite(a).all() and np.abs(a).sum() > 0


@pytest.mark.parametrize("agg,gcn", [("MEAN", False), ("MEAN", True),
                                     ("MAX", False), ("LSTM", False)])
def test_sharded_inference_matches_single_device(agg, gcn):
    """full_graph_embeddings_sharded over the virtual 8-device mesh ==
    the single-device propagation (uneven N to exercise row padding)."""
    from graphsage_tpu.infer import full_graph_embeddings_sharded

    g, feats = _random_graph(n=61, extra_edges=150, seed=13)
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8,
                          agg_func=agg, gcn=gcn)
    params = init_graphsage(jax.random.PRNGKey(4), cfg)
    pad = g.to_padded()
    want = full_graph_embeddings(params, cfg, feats, pad)
    got = full_graph_embeddings_sharded(params, cfg, feats, pad)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_lstm_hybrid_inference_topology(tmp_path):
    """A cached-LSTM-hybrid model must serve with MEAN at layer 1 and the
    live cell above — NOT the all-LSTM forward (whose layer-0 cell the
    hybrid never trains).  lstm_hybrid=True must equal a manual
    MEAN-layer-1 + LSTM-layer-2 propagation and differ from all-LSTM."""
    g, feats = _random_graph(n=31, extra_edges=70, seed=17)
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8,
                          agg_func="LSTM")
    params = init_graphsage(jax.random.PRNGKey(5), cfg)
    pad = g.to_padded()
    hybrid = full_graph_embeddings(params, cfg, feats, pad,
                                   lstm_hybrid=True)
    all_lstm = full_graph_embeddings(params, cfg, feats, pad)
    assert not np.allclose(hybrid, all_lstm)
    # independent construction: numpy-MEAN layer 1 (oracle), then the live
    # LSTM cell + SageLayer at layer 2 via the model ops directly
    from graphsage_tpu.models.layers import sage_layer_apply
    from graphsage_tpu.models.lstm_agg import lstm_aggregate
    cfg_mean = dataclasses.replace(cfg, agg_func="MEAN")
    h1 = _numpy_oracle({"layers": [jax.device_get(params["layers"][0])]},
                       dataclasses.replace(cfg_mean, num_layers=1),
                       feats, g).astype(np.float32)
    n, p = pad.neighbors.shape
    mask = ((np.arange(p)[None] < pad.degrees[:, None])
            & (pad.neighbors != np.arange(n)[:, None])).astype(np.float32)
    agg2 = lstm_aggregate(params["agg"][1], jnp.asarray(h1),
                          jnp.asarray(pad.neighbors), jnp.asarray(mask))
    want = np.asarray(sage_layer_apply(params["layers"][1],
                                       jnp.asarray(h1), agg2), np.float32)
    np.testing.assert_allclose(hybrid, want, rtol=2e-4, atol=2e-5)

    # bundle round-trip: CLI meta flag drives from_bundle
    from graphsage_tpu.models.layers import init_classifier
    full = {"sage": params, "clf": init_classifier(jax.random.PRNGKey(6),
                                                   8, 3)}
    path = str(tmp_path / "hb")
    export_bundle(path, full, cfg, 3, meta={"lstm_hybrid": True})
    sess = InferenceSession.from_bundle(path, feats, pad)
    assert sess.lstm_hybrid
    np.testing.assert_allclose(sess.embeddings(), hybrid,
                               rtol=1e-5, atol=1e-6)


def test_export_load_roundtrip_and_session(tmp_path):
    g, feats = _random_graph()
    n_classes = 4
    cfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"sage": init_graphsage(k1, cfg),
              "clf": init_classifier(k2, 8, n_classes)}
    path = str(tmp_path / "bundle")
    export_bundle(path, params, cfg, n_classes, meta={"dataset": "toy"})

    restored, rcfg, rncls, meta = load_bundle(path)
    assert rcfg == cfg and rncls == n_classes and meta == {"dataset": "toy"}
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(params), restored)

    sess = InferenceSession.from_bundle(path, feats, g.to_padded())
    embs = sess.embeddings()
    direct = full_graph_embeddings(params["sage"], cfg, feats, g.to_padded())
    np.testing.assert_allclose(embs, direct, rtol=1e-6, atol=1e-7)

    nodes = np.array([0, 5, 17])
    lp = sess.log_probs(nodes)
    want_lp = np.asarray(
        classifier_apply(params["clf"], jnp.asarray(embs[nodes])))
    np.testing.assert_allclose(lp, want_lp, rtol=1e-5, atol=1e-6)
    pred = sess.predict(nodes)
    assert pred.shape == (3,) and set(pred) <= set(range(n_classes))
    np.testing.assert_array_equal(pred, np.argmax(want_lp, axis=1))
    # a scalar node id behaves as a 1-element batch
    assert sess.predict(5).shape == (1,)
    assert sess.predict(5)[0] == sess.predict([5])[0]
    # link scores: cosine in [-1, 1], self-similarity exactly 1
    s = sess.score_pairs([0, 5, 17], [0, 17, 5])
    assert s.shape == (3,)
    assert np.all(np.abs(s) <= 1.0 + 1e-6)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(s[1], s[2], atol=1e-6)  # symmetric
    # fetch=False returns the device-resident table, same values
    dev = full_graph_embeddings(params["sage"], cfg, feats, g.to_padded(),
                                fetch=False)
    np.testing.assert_allclose(np.asarray(dev, dtype=np.float32), direct,
                               rtol=1e-6, atol=1e-7)
