"""Distributed supervised training over the virtual 8-device mesh:
edge-partitioned features + halo exchange + pmean'd gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.parallel.halo import shard_features
from graphsage_tpu.train.distributed import (
    build_dist_batch,
    dist_batch_to_device,
    make_dist_sup_step,
)


@pytest.fixture(scope="module")
def setup():
    n_dev = 8
    ds = synthetic_power_law(600, 3000, num_feats=24, num_classes=4, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=24, out_size=16)
    key = jax.random.PRNGKey(0)
    params = {
        "sage": init_graphsage(key, mcfg),
        "clf": init_classifier(key, 16, 4),
    }
    return ds, mesh, mcfg, params, n_dev


def test_distributed_step_runs_and_learns(setup):
    ds, mesh, mcfg, params, n_dev = setup
    rng = np.random.RandomState(0)
    step = make_dist_sup_step(mcfg, mesh, lr=0.5)

    feats_sh = jax.device_put(
        jnp.asarray(shard_features(ds.features, n_dev)),
        NamedSharding(mesh, P("data", None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    losses = []
    for it in range(6):
        batch = rng.choice(len(ds.train_nodes), (n_dev, 8))
        batch = ds.train_nodes[batch]
        db = build_dist_batch(ds.graph, ds.labels, batch,
                              mcfg.num_layers, fanout=4, seed=it)
        args = dist_batch_to_device(db, mesh)
        params, loss = step(params, feats_sh, *args)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_distributed_matches_single_device_forward(setup):
    """With identical frontiers, the distributed halo forward must equal a
    single-device gathered forward (same params, same batch)."""
    ds, mesh, mcfg, params, n_dev = setup
    from graphsage_tpu.models.graphsage import graphsage_apply, Frontier
    from graphsage_tpu.parallel.halo import halo_gather_local, plan_halo
    from graphsage_tpu.train.distributed import sample_dense_host
    from jax import shard_map

    rng = np.random.RandomState(3)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 6))]
    db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                          fanout=4, seed=99)

    # distributed forward via shard_map
    def fwd_local(feats_local, requests, addr_owner, addr_slot,
                  addr_is_local, addr_local, f_idx, f_mask, f_self):
        frontiers = [Frontier(idx=i[0], mask=m[0], self_idx=s[0])
                     for i, m, s in zip(f_idx, f_mask, f_self)]
        x0 = halo_gather_local(feats_local, requests[0], addr_owner[0],
                               addr_slot[0], addr_is_local[0],
                               addr_local[0], "data")
        return graphsage_apply(params["sage"], mcfg, x0, frontiers)

    n_layers = mcfg.num_layers
    fwd = shard_map(
        fwd_local, mesh=mesh,
        in_specs=(P("data", None), P("data", None, None), P("data", None),
                  P("data", None), P("data", None), P("data", None),
                  tuple([P("data", None, None)] * n_layers),
                  tuple([P("data", None, None)] * n_layers),
                  tuple([P("data", None)] * n_layers)),
        out_specs=P("data", None))

    feats_sh = jax.device_put(
        jnp.asarray(shard_features(ds.features, n_dev)),
        NamedSharding(mesh, P("data", None)))
    args = dist_batch_to_device(db, mesh)
    out = np.asarray(jax.jit(fwd)(feats_sh, *args[:-2]))
    out = out.reshape(n_dev, -1, mcfg.out_size)

    # single-device replay of each shard using the same frontiers
    feats = jnp.asarray(ds.features)
    for dcheck in range(0, n_dev, 3):
        frontiers = [Frontier(idx=jnp.asarray(f.idx[dcheck]),
                              mask=jnp.asarray(f.mask[dcheck]),
                              self_idx=jnp.asarray(f.self_idx[dcheck]))
                     for f in db.frontiers]
        # reconstruct the x0 ids this shard needed (local slots bypass
        # the request tables)
        rows_per = shard_features(ds.features, n_dev).shape[0] // n_dev
        remote_ids = (db.addr_owner[dcheck] * rows_per
                      + db.requests[dcheck][db.addr_owner[dcheck],
                                            db.addr_slot[dcheck]])
        local_ids = dcheck * rows_per + db.addr_local[dcheck]
        flat_ids = np.where(db.addr_is_local[dcheck] > 0, local_ids,
                            remote_ids)
        x0 = jnp.take(feats, jnp.asarray(flat_ids), axis=0)
        want = np.asarray(graphsage_apply(params["sage"], mcfg, x0,
                                          frontiers))
        np.testing.assert_allclose(out[dcheck], want, rtol=1e-5, atol=1e-5)


def test_distributed_update_matches_single_device(setup):
    """One distributed step's parameter update must equal a single-device
    update computed from the same frontiers: loss = mean of per-shard
    losses, grads pmean'd then clipped (shards are equal-sized)."""
    ds, mesh, mcfg, params, n_dev = setup
    import jax.numpy as jnp
    from graphsage_tpu.losses import supervised_nll
    from graphsage_tpu.models import classifier_apply
    from graphsage_tpu.models.graphsage import Frontier, graphsage_apply
    from graphsage_tpu.parallel.halo import shard_features
    from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update

    rng = np.random.RandomState(7)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 5))]
    db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                          fanout=3, seed=5)

    lr, clip = 0.4, 5.0
    step = make_dist_sup_step(mcfg, mesh, lr=lr, clip=clip)
    feats_padded = shard_features(ds.features, n_dev)
    feats_sh = jax.device_put(jnp.asarray(feats_padded),
                              NamedSharding(mesh, P("data", None)))
    params_repl = jax.device_put(params, NamedSharding(mesh, P()))
    new_params, loss = step(params_repl, feats_sh,
                            *dist_batch_to_device(db, mesh))

    # single-device replay: mean over shards of per-shard loss
    rows_per = feats_padded.shape[0] // n_dev
    feats = jnp.asarray(feats_padded)

    def total_loss(p):
        acc = 0.0
        for d in range(n_dev):
            frontiers = [Frontier(idx=jnp.asarray(f.idx[d]),
                                  mask=jnp.asarray(f.mask[d]),
                                  self_idx=jnp.asarray(f.self_idx[d]))
                         for f in db.frontiers]
            remote_ids = (db.addr_owner[d] * rows_per
                          + db.requests[d][db.addr_owner[d],
                                           db.addr_slot[d]])
            local_ids = d * rows_per + db.addr_local[d]
            flat_ids = np.where(db.addr_is_local[d] > 0, local_ids,
                                remote_ids)
            x0 = jnp.take(feats, jnp.asarray(flat_ids), axis=0)
            embs = graphsage_apply(p["sage"], mcfg, x0, frontiers)
            logp = classifier_apply(p["clf"], embs)
            labels = jnp.asarray(db.labels[d])
            mask = jnp.ones(labels.shape[0], dtype=embs.dtype)
            acc = acc + supervised_nll(logp, labels, mask)
        return acc / n_dev

    want_loss, grads = jax.value_and_grad(total_loss)(params)
    grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
    want_params = sgd_update(params, grads, lr)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_dist_trainer_end_to_end():
    """Full distributed protocol on the 8-device mesh: trains, evaluates,
    and learns above chance on a community-structured synthetic graph."""
    from jax.sharding import Mesh
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.dist_trainer import DistTrainer, DistTrainConfig

    ds = synthetic_power_law(800, 4000, num_feats=24, num_classes=4, seed=9)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=24, out_size=16)
    tcfg = DistTrainConfig(b_loc=16, epochs=3, lr=0.3, fanout=4, seed=1,
                           verbose=False)
    tr = DistTrainer(ds, mcfg, tcfg, mesh=mesh)
    best = tr.fit()
    assert best > 0.4, (best, tr.history)


def test_tail_row_mask_zeroes_padded_rows(setup):
    """Padded tail repeats must not get multiplied loss weight: a step on
    (batch, valid-mask) equals a step where the masked rows' labels are
    garbage — i.e. masked rows contribute nothing."""
    ds, mesh, mcfg, params, n_dev = setup
    rng = np.random.RandomState(7)
    step = make_dist_sup_step(mcfg, mesh, lr=0.5)
    feats_sh = jax.device_put(
        jnp.asarray(shard_features(ds.features, n_dev)),
        NamedSharding(mesh, P("data", None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 6))]
    valid = np.ones((n_dev, 6), bool)
    valid[-1, 3:] = False  # a short tail on the last device

    db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                          fanout=4, seed=5, valid=valid)
    _, loss_a = step(params, feats_sh, *dist_batch_to_device(db, mesh))

    bad_labels = ds.labels.copy()
    db2 = build_dist_batch(ds.graph, bad_labels, batch, mcfg.num_layers,
                           fanout=4, seed=5, valid=valid)
    # corrupt the labels of masked rows only
    lab = db2.labels.copy()
    lab[-1, 3:] = (lab[-1, 3:] + 1) % ds.num_classes
    db2 = type(db2)(**{**db2.__dict__, "labels": lab})
    _, loss_b = step(params, feats_sh, *dist_batch_to_device(db2, mesh))

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


@pytest.mark.parametrize("kind,method", [("normal", "unsup"),
                                         ("margin", "unsup"),
                                         ("normal", "plus_unsup")])
def test_distributed_unsup_step_runs_and_learns(setup, kind, method):
    """All three learn methods run through the halo-partitioned mesh step
    (VERDICT round-1 item 6)."""
    from graphsage_tpu.sampler import PairSampler
    from graphsage_tpu.train.distributed import (
        build_dist_unsup_batch,
        make_dist_unsup_step,
        pairs_to_device,
    )

    ds, mesh, mcfg, params, n_dev = setup
    rng = np.random.RandomState(3)
    ps = PairSampler(ds.graph, ds.train_nodes)
    num_neg = 6 if kind == "margin" else 12
    step = make_dist_unsup_step(mcfg, mesh, unsup_loss=kind,
                                learn_method=method, lr=0.2)
    feats_sh = jax.device_put(
        jnp.asarray(shard_features(ds.features, n_dev)),
        NamedSharding(mesh, P("data", None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    losses = []
    for it in range(4):
        batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 6))]
        db, pairs = build_dist_unsup_batch(
            ds.graph, ds.labels, ps, batch, mcfg.num_layers, fanout=4,
            num_neg=num_neg, seed=50 + it)
        params, loss = step(params, feats_sh,
                            *dist_batch_to_device(db, mesh),
                            *pairs_to_device(pairs, mesh))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_distributed_unsup_update_matches_single_device(setup):
    """One distributed unsup step == single-device replay: mean of
    per-shard pair losses, grads through the same math, clip, SGD."""
    from graphsage_tpu.losses import unsup_loss_from_pairbatch
    from graphsage_tpu.models.graphsage import Frontier, graphsage_apply
    from graphsage_tpu.sampler import PairSampler
    from graphsage_tpu.train.distributed import (
        build_dist_unsup_batch,
        make_dist_unsup_step,
        pairs_to_device,
    )
    from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update

    ds, mesh, mcfg, params, n_dev = setup
    rng = np.random.RandomState(11)
    ps = PairSampler(ds.graph, ds.train_nodes)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 5))]
    db, pairs = build_dist_unsup_batch(ds.graph, ds.labels, ps, batch,
                                       mcfg.num_layers, fanout=3,
                                       num_neg=8, seed=9)
    lr, clip = 0.4, 5.0
    step = make_dist_unsup_step(mcfg, mesh, unsup_loss="normal",
                                learn_method="unsup", lr=lr, clip=clip)
    feats_padded = shard_features(ds.features, n_dev)
    feats_sh = jax.device_put(jnp.asarray(feats_padded),
                              NamedSharding(mesh, P("data", None)))
    params_repl = jax.device_put(params, NamedSharding(mesh, P()))
    new_params, loss = step(params_repl, feats_sh,
                            *dist_batch_to_device(db, mesh),
                            *pairs_to_device(pairs, mesh))

    rows_per = feats_padded.shape[0] // n_dev
    feats = jnp.asarray(feats_padded)

    def total_loss(p):
        acc = 0.0
        for d in range(n_dev):
            frontiers = [Frontier(idx=jnp.asarray(f.idx[d]),
                                  mask=jnp.asarray(f.mask[d]),
                                  self_idx=jnp.asarray(f.self_idx[d]))
                         for f in db.frontiers]
            remote_ids = (db.addr_owner[d] * rows_per
                          + db.requests[d][db.addr_owner[d],
                                           db.addr_slot[d]])
            local_ids = d * rows_per + db.addr_local[d]
            flat_ids = np.where(db.addr_is_local[d] > 0, local_ids,
                                remote_ids)
            x0 = jnp.take(feats, jnp.asarray(flat_ids), axis=0)
            embs = graphsage_apply(p["sage"], mcfg, x0, frontiers)
            pd = {k: jnp.asarray(v[d]) for k, v in pairs.items()}
            acc = acc + unsup_loss_from_pairbatch(embs, pd, "normal")
        return acc / n_dev

    want_loss, grads = jax.value_and_grad(total_loss)(params)
    grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
    want_params = sgd_update(params, grads, lr)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_dist_trainer_unsup_and_plus_unsup():
    """DistTrainer runs the unsup protocol (pair loss + periodic
    classifier fit) and plus_unsup end-to-end on the 8-device mesh."""
    from jax.sharding import Mesh
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.dist_trainer import DistTrainer, DistTrainConfig

    ds = synthetic_power_law(400, 2000, num_feats=16, num_classes=4, seed=9)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)

    tcfg = DistTrainConfig(learn_method="plus_unsup", b_loc=8, epochs=2,
                           lr=0.3, fanout=4, seed=1, verbose=False)
    tr = DistTrainer(ds, mcfg, tcfg, mesh=mesh)
    best = tr.fit()
    assert np.isfinite(best) and best > 0.3, (best, tr.history)

    tcfg2 = DistTrainConfig(learn_method="unsup", b_loc=8, epochs=2,
                            lr=0.3, fanout=4, seed=1, clf_epochs=10,
                            verbose=False)
    tr2 = DistTrainer(ds, mcfg, tcfg2, mesh=mesh)
    best2 = tr2.fit()
    # unsup + tiny classifier fit: just has to be finite and above chance/2
    assert np.isfinite(best2) and best2 > 0.15, (best2, tr2.history)
    # best-val→test must see EVERY clf epoch, matching Trainer's
    # per-epoch evaluation protocol (one train_classification call at
    # epoch 1 → clf_epochs evals in history, not a single final one)
    assert len(tr2.history) == tcfg2.clf_epochs, tr2.history


def test_distributed_step_honors_compute_dtype(setup):
    """--compute_dtype bfloat16 must actually run the dist step in bf16
    (regression: the halo pipeline silently ignored it).  Masters stay
    f32; the bf16 loss tracks the f32 loss closely."""
    import dataclasses

    import jax.numpy as jnp
    from graphsage_tpu.parallel.halo import shard_features

    ds, mesh, mcfg, params, n_dev = setup
    rng = np.random.RandomState(9)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (n_dev, 5))]
    db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                          fanout=3, seed=5)
    feats_sh = jax.device_put(
        jnp.asarray(shard_features(ds.features, n_dev)),
        NamedSharding(mesh, P("data", None)))
    params_repl = jax.device_put(params, NamedSharding(mesh, P()))

    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(mcfg, compute_dtype=dtype)
        step = make_dist_sup_step(cfg, mesh, lr=0.4, clip=5.0)
        new_params, loss = step(params_repl, feats_sh,
                                *dist_batch_to_device(db, mesh))
        losses[dtype] = float(loss)
        # master weights stay f32 regardless of compute dtype
        assert all(l.dtype == np.float32 for l in
                   jax.tree_util.tree_leaves(jax.device_get(new_params)))
    assert np.isfinite(list(losses.values())).all()
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05 * max(
        1.0, abs(losses["float32"])), losses


def test_unsup_batch_target_valid_masks_tail_repeats(setup):
    """np.resize tail repeats must not get pair-loss weight: target_valid
    zeroes node_valid for padded target positions (regression — the sup
    path masked its NLL rows but the unsup pair objective did not)."""
    from graphsage_tpu.sampler import PairSampler
    from graphsage_tpu.train.distributed import build_dist_unsup_batch

    ds, mesh, mcfg, params, n_dev = setup
    ps = PairSampler(ds.graph, ds.train_nodes)
    b_loc = 4
    real = n_dev * b_loc - 5  # tail: last 5 positions are repeats
    chunk = np.resize(ds.train_nodes[:real], n_dev * b_loc)
    batch = chunk.reshape(n_dev, b_loc)
    valid = (np.arange(n_dev * b_loc) < real).reshape(n_dev, b_loc)
    _, pairs_masked = build_dist_unsup_batch(
        ds.graph, ds.labels, ps, batch, mcfg.num_layers, fanout=3,
        num_neg=6, seed=3, target_valid=valid)
    _, pairs_raw = build_dist_unsup_batch(
        ds.graph, ds.labels, ps, batch, mcfg.num_layers, fanout=3,
        num_neg=6, seed=3)
    nv_m, nv_r = pairs_masked["node_valid"], pairs_raw["node_valid"]
    assert nv_m.shape == nv_r.shape == (n_dev, b_loc)
    # repeats zeroed, real positions untouched
    np.testing.assert_array_equal(nv_m[valid], nv_r[valid])
    assert (nv_m[~valid] == 0).all()
    assert nv_r[~valid].sum() > 0  # the raw path did weight the repeats


def test_dist_trainer_emits_structured_metrics(tmp_path):
    """DistTrainer logs epoch/eval events through MetricsLogger — the
    config-5 production pipeline must emit the north-star metric
    (edges_per_sec) machine-readably (VERDICT r04 weak #4)."""
    import json
    from jax.sharding import Mesh
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.dist_trainer import DistTrainer, DistTrainConfig

    ds = synthetic_power_law(400, 2000, num_feats=16, num_classes=3, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=8)
    path = str(tmp_path / "dist_metrics.jsonl")
    tcfg = DistTrainConfig(b_loc=16, epochs=2, lr=0.3, fanout=4, seed=1,
                           verbose=False, metrics_path=path)
    tr = DistTrainer(ds, mcfg, tcfg, mesh=mesh)
    tr.fit()
    with open(path) as f:
        events = [json.loads(ln) for ln in f if ln.strip()]
    kinds = [e["event"] for e in events]
    assert kinds.count("epoch") == 2
    assert "eval" in kinds
    ep = next(e for e in events if e["event"] == "epoch")
    for field in ("mean_loss", "steps", "nodes_per_step", "epoch_s",
                  "edges_per_sec", "n_dev"):
        assert field in ep, (field, ep)
    assert ep["n_dev"] == 2 and ep["edges_per_sec"] > 0
