"""Sharded leaf-cached epoch (train/cached_dist.py) over the virtual
8-device mesh: parity vs the single-device cached epoch and learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.train.cached import make_cached_sup_epoch
from graphsage_tpu.train.cached_dist import (
    build_epoch_stack,
    make_cached_dist_epoch,
    pad_node_tables,
    place_epoch_inputs,
)

N_DEV = 8


def _setup(num_nodes=203, num_feats=24, num_classes=4, seed=3,
           out_size=16, agg="MEAN", gcn=False):
    ds = synthetic_power_law(num_nodes, num_nodes * 6, num_feats=num_feats,
                             num_classes=num_classes, seed=seed)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=num_feats,
                           out_size=out_size, agg_func=agg, gcn=gcn)
    key = jax.random.PRNGKey(0)
    params = {
        "sage": init_graphsage(key, mcfg),
        "clf": init_classifier(key, out_size, num_classes),
    }
    if agg == "LSTM":
        # exact dist-vs-single parity needs order-DETERMINISTIC sampling,
        # and take-all now returns a fresh random permutation (the LSTM
        # slot order is the paper's randomization; sampler/device.py) —
        # whose draws differ between the flat [B] and per-shard [b_loc]
        # programs.  A degree-1 matching makes every permutation a
        # 1-element identity while still driving the live LSTM cell and
        # the collective wiring.
        from graphsage_tpu.data import CSRGraph
        src = np.arange(0, num_nodes - 1, 2, dtype=np.int64)
        pad = CSRGraph.from_edges(num_nodes, src, src + 1).to_padded()
    else:
        pad = ds.graph.to_padded()
    feats, neighbors, degrees = pad_node_tables(
        ds.features, pad.neighbors, pad.degrees, N_DEV)
    return ds, mesh, mcfg, params, feats, neighbors, degrees


@pytest.mark.parametrize("agg,gcn", [("MEAN", False), ("MAX", False),
                                     ("MEAN", True), ("LSTM", False)])
def test_dist_epoch_matches_single_device_under_takeall(agg, gcn):
    """With fanout >= table width every sampling op is take-all
    (RNG-independent), so the sharded epoch must reproduce the
    single-device cached epoch exactly: same losses, same params.  This
    checks the whole collective wiring — all_gather row order, the
    psum_scatter backward, grad pmean — numerically."""
    ds, mesh, mcfg, params, feats, neighbors, degrees = _setup(
        agg=agg, gcn=gcn)
    fanout = neighbors.shape[1]  # >= max degree -> take-all branch
    b_loc, t = 4, 3
    b = N_DEV * b_loc
    rng = np.random.RandomState(0)
    batches, labels, row_masks = build_epoch_stack(
        ds.train_nodes, ds.labels, N_DEV, b, rng)
    batches, labels, row_masks = batches[:t], labels[:t], row_masks[:t]
    assert row_masks.all(), "parity test wants full batches"
    key = jax.random.PRNGKey(42)

    # single-device: same steps as a flat [T, B] scan
    single_epoch = jax.jit(make_cached_sup_epoch(mcfg, fanout=fanout))
    p_ref, losses_ref = single_epoch(
        params, jnp.asarray(feats), jnp.asarray(neighbors),
        jnp.asarray(degrees), jnp.asarray(batches.reshape(t, b)),
        jnp.asarray(labels.reshape(t, b)), key)

    dist_epoch = make_cached_dist_epoch(mcfg, mesh, fanout=fanout)
    args = place_epoch_inputs(mesh, feats, neighbors, degrees, batches,
                              labels, row_masks)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    p_new, losses = dist_epoch(p_sh, *args, key)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=1e-5, atol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_new = jax.tree_util.tree_leaves(p_new)
    for a, b_ in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_dist_epoch_learns_with_real_fanout():
    """Real subsampled fanout (per-device RNG streams) trains: mean loss
    falls across epochs and params stay finite."""
    ds, mesh, mcfg, params, feats, neighbors, degrees = _setup(
        num_nodes=400, seed=5)
    epoch_fn = make_cached_dist_epoch(mcfg, mesh, fanout=4, lr=0.7)
    rng = np.random.RandomState(1)
    p = jax.device_put(params, NamedSharding(mesh, P()))
    key = jax.random.PRNGKey(7)
    means = []
    for ep in range(3):
        batches, labels, row_masks = build_epoch_stack(
            ds.train_nodes, ds.labels, N_DEV, 32, rng)
        args = place_epoch_inputs(mesh, feats, neighbors, degrees,
                                  batches, labels, row_masks)
        key, sub = jax.random.split(key)
        p, losses = epoch_fn(p, *args, sub)
        means.append(float(np.mean(np.asarray(losses))))
    assert all(np.isfinite(means)), means
    assert means[-1] < means[0], means
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(p))


@pytest.mark.parametrize("learn_method,unsup_loss",
                         [("unsup", "normal"), ("unsup", "margin"),
                          ("plus_unsup", "normal")])
def test_dist_unsup_epoch_loss_parity_and_learns(learn_method, unsup_loss):
    """Sharded unsup/plus_unsup cached epoch: the first scanned step's
    loss must equal the mean of per-device losses replayed single-device
    (take-all fanout makes the forward RNG-independent), and training
    reduces the loss across epochs."""
    from graphsage_tpu.losses import unsup_loss_from_pairbatch
    from graphsage_tpu.losses import supervised_nll
    from graphsage_tpu.sampler import PairSampler
    from graphsage_tpu.train.cached import (
        cached_forward,
        refresh_leaf_cache,
    )
    from graphsage_tpu.train.cached_dist import (
        build_unsup_epoch_stack,
        make_cached_dist_unsup_epoch,
    )

    ds, mesh, mcfg, params, feats, neighbors, degrees = _setup(seed=7)
    fanout = neighbors.shape[1]
    sampler = PairSampler(ds.graph, ds.train_nodes)
    rng = np.random.RandomState(2)
    batches, labels, row_masks, pair_stack = build_unsup_epoch_stack(
        sampler, ds.train_nodes, ds.labels, N_DEV, N_DEV * 4,
        num_neg=10, rng=rng)
    epoch_fn = make_cached_dist_unsup_epoch(
        mcfg, mesh, unsup_loss=unsup_loss, fanout=fanout,
        learn_method=learn_method)
    key = jax.random.PRNGKey(13)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    feats_j, neigh_j, deg_j = (jnp.asarray(feats), jnp.asarray(neighbors),
                               jnp.asarray(degrees))
    _, losses = epoch_fn(p_sh, feats_j, neigh_j, deg_j, batches, labels,
                         row_masks, pair_stack, key)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), losses

    # replay step 0 per device on ONE device: same cache under take-all
    cf, cc = refresh_leaf_cache(jax.random.PRNGKey(0), feats_j, neigh_j,
                                deg_j, fanout, agg=mcfg.agg_func)
    total = 0.0
    for d in range(N_DEV):
        embs = cached_forward(params, mcfg, feats_j, cf, cc, neigh_j,
                              deg_j, batches[0, d], jax.random.PRNGKey(1),
                              fanout)
        pairs_d = {k: v[0, d] for k, v in pair_stack.items()}
        loss_d = unsup_loss_from_pairbatch(embs, pairs_d, unsup_loss,
                                           q=10.0, margin=3.0)
        if learn_method == "plus_unsup":
            from graphsage_tpu.models import classifier_apply
            logp = classifier_apply(params["clf"], embs)
            loss_d = loss_d + supervised_nll(logp, labels[0, d],
                                             row_masks[0, d])
        total += float(loss_d)
    np.testing.assert_allclose(losses[0], total / N_DEV, rtol=2e-5,
                               atol=2e-5)

    # learning: run 3 more epochs, mean loss falls
    p = p_sh
    means = [float(np.mean(losses))]
    for ep in range(3):
        b2, l2, m2, ps2 = build_unsup_epoch_stack(
            sampler, ds.train_nodes, ds.labels, N_DEV, N_DEV * 4,
            num_neg=10, rng=rng)
        key, sub = jax.random.split(key)
        p, losses = epoch_fn(p, feats_j, neigh_j, deg_j, b2, l2, m2, ps2,
                             sub)
        means.append(float(np.mean(np.asarray(losses))))
    assert means[-1] < means[0], means


def test_dist_epoch_masks_padded_tail():
    """The wrap-padded tail rows (row_mask 0) must not contribute: an
    epoch over [real | junk-label-padded] rows equals one over
    [real | real-label-padded] rows when both masks zero the pad."""
    ds, mesh, mcfg, params, feats, neighbors, degrees = _setup(seed=9)
    fanout = neighbors.shape[1]
    epoch_fn = make_cached_dist_epoch(mcfg, mesh, fanout=fanout)
    nodes = ds.train_nodes[:N_DEV * 4 + 5]     # forces a padded tail
    rng_a = np.random.RandomState(3)
    batches, labels, row_masks = build_epoch_stack(
        nodes, ds.labels, N_DEV, N_DEV * 4, rng_a)
    assert not row_masks.all()
    labels_junk = labels.copy()
    labels_junk[row_masks == 0] = 0            # corrupt only masked rows
    key = jax.random.PRNGKey(11)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    out_a = epoch_fn(p_sh, *place_epoch_inputs(
        mesh, feats, neighbors, degrees, batches, labels, row_masks), key)
    out_b = epoch_fn(p_sh, *place_epoch_inputs(
        mesh, feats, neighbors, degrees, batches, labels_junk, row_masks),
        key)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               rtol=1e-6, atol=1e-6)
