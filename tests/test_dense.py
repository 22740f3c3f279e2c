"""Dense on-device pipeline: sup epoch scan, unsup/plus_unsup steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.sampler import PairSampler
from graphsage_tpu.train.dense import (
    edges_per_batch,
    make_dense_sup_epoch,
    make_dense_sup_step,
    make_dense_unsup_step,
)
from graphsage_tpu.train.trainer import _pair_tensors


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4, seed=4)
    pad = ds.graph.to_padded()
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    key = jax.random.PRNGKey(0)
    params = {
        "sage": init_graphsage(key, mcfg),
        "clf": init_classifier(key, 16, 4),
    }
    return ds, pad, mcfg, params


def test_dense_sup_epoch_scan_learns(setup):
    ds, pad, mcfg, params = setup
    epoch_fn = jax.jit(make_dense_sup_epoch(mcfg, fanout=4, lr=0.3))
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
    # params actually moved
    d0 = np.abs(np.asarray(params2["sage"]["layers"][0]["weight"])
                - np.asarray(params["sage"]["layers"][0]["weight"])).max()
    assert d0 > 0


@pytest.mark.parametrize("kind,method", [("normal", "unsup"),
                                         ("margin", "unsup"),
                                         ("normal", "plus_unsup")])
def test_dense_unsup_step(setup, kind, method):
    ds, pad, mcfg, params = setup
    ps = PairSampler(ds.graph, ds.train_nodes)
    rng = np.random.RandomState(1)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), 16)]
    num_neg = 6 if kind == "margin" else 20
    pb = ps.sample_batch(batch, num_neg=num_neg, rng=rng)
    ext = pb.unique_nodes  # padded extended batch

    step = jax.jit(make_dense_unsup_step(mcfg, unsup_loss=kind, fanout=4,
                                         lr=0.1, learn_method=method))
    labels = jnp.asarray(ds.labels)[jnp.asarray(ext)]
    p2, loss = step(params, jnp.asarray(ds.features),
                    jnp.asarray(pad.neighbors), jnp.asarray(pad.degrees),
                    jnp.asarray(ext), labels, _pair_tensors(pb),
                    jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    d0 = np.abs(np.asarray(p2["sage"]["layers"][0]["weight"])
                - np.asarray(params["sage"]["layers"][0]["weight"])).max()
    assert d0 > 0


def test_edges_per_batch_formula():
    assert edges_per_batch(20, 2, 10) == 20 * 10 + 20 * 11 * 10
    assert edges_per_batch(1, 1, 5) == 5


def test_dense_equals_compact_under_takeall():
    """With fanout >= max degree both pipelines sample deterministically
    (take-all), so the dense per-occurrence forward must equal the compact
    dedup forward for the same batch and params."""
    from graphsage_tpu.data import CSRGraph
    from graphsage_tpu.models.graphsage import (
        graphsage_apply,
        graphsage_apply_gathered,
    )
    from graphsage_tpu.sampler import build_compact_batch
    from graphsage_tpu.sampler.device import sample_frontiers_dense

    rng = np.random.RandomState(0)
    n = 40
    src = np.concatenate([np.arange(n), rng.randint(0, n, 60)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.randint(0, n, 60)])
    keep = src != dst
    g = CSRGraph.from_edges(n, src[keep], dst[keep])
    d, h = 8, 6
    feats = jnp.asarray(rng.randn(n, d).astype(np.float32))
    fanout = int(g.degrees.max()) + 1

    mcfg = GraphSageConfig(num_layers=2, input_size=d, out_size=h)
    params = {"sage": init_graphsage(jax.random.PRNGKey(3), mcfg)}
    batch = rng.choice(n, 7, replace=False)

    pad = g.to_padded()
    x0_ids, frontiers = sample_frontiers_dense(
        jax.random.PRNGKey(5), jnp.asarray(pad.neighbors),
        jnp.asarray(pad.degrees), jnp.asarray(batch.astype(np.int32)),
        num_layers=2, fanout=fanout)
    dense_out = np.asarray(graphsage_apply_gathered(
        params["sage"], mcfg, feats, x0_ids, frontiers))

    cb = build_compact_batch(g, batch, np.random.RandomState(1),
                             num_layers=2, fanout=fanout, native="never")
    x0 = feats[jnp.asarray(cb.x0_ids)]
    cfront = jax.tree_util.tree_map(jnp.asarray, list(cb.frontiers))
    compact_out = np.asarray(graphsage_apply(params["sage"], mcfg, x0,
                                             cfront))

    np.testing.assert_allclose(dense_out[:len(batch)],
                               compact_out[:len(batch)],
                               rtol=2e-5, atol=2e-5)


def test_dense_plus_unsup_row_mask_excludes_bucket_pads(setup):
    """The plus_unsup NLL must not average bucket-padding rows (node-0
    duplicates in PairBatch.unique_nodes) into the supervised term — the
    step now accepts the same row_mask contract as the cached/dist
    steps, and masking the pads changes the loss whenever pads exist."""
    ds, pad, mcfg, params = setup
    ps = PairSampler(ds.graph, ds.train_nodes)
    rng = np.random.RandomState(3)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), 16)]
    pb = ps.sample_batch(batch, num_neg=20, rng=rng)
    assert pb.num_unique < len(pb.unique_nodes), "want real bucket pads"

    step = jax.jit(make_dense_unsup_step(mcfg, unsup_loss="normal",
                                         fanout=4, lr=0.1,
                                         learn_method="plus_unsup"))
    ext = jnp.asarray(pb.unique_nodes)
    labels = jnp.asarray(ds.labels)[ext]
    args = (params, jnp.asarray(ds.features), jnp.asarray(pad.neighbors),
            jnp.asarray(pad.degrees), ext, labels, _pair_tensors(pb),
            jax.random.PRNGKey(2))
    row_mask = jnp.asarray(
        (np.arange(len(pb.unique_nodes)) < pb.num_unique)
        .astype(np.float32))
    _, loss_masked = step(*args, row_mask)
    _, loss_unmasked = step(*args)
    assert np.isfinite(float(loss_masked))
    assert float(loss_masked) != float(loss_unmasked)
