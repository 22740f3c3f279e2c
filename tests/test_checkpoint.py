"""Checkpoint save + resume round-trip (the reference has save-only,
src/utils.py:52; resume is a framework addition per SURVEY §2b)."""

import numpy as np
import pytest

import jax

from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = GraphSageConfig(num_layers=2, input_size=8, out_size=4)
    key = jax.random.PRNGKey(0)
    params = {
        "sage": init_graphsage(key, cfg),
        "clf": init_classifier(key, 4, 3),
    }
    rng = np.random.RandomState(7)
    rng.rand(100)  # advance state
    expected_next = rng.rand(5).copy()
    rng2 = np.random.RandomState(7)
    rng2.rand(100)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, epoch=12, max_vali_f1=0.77, rng=rng2)

    fresh = {
        "sage": init_graphsage(jax.random.PRNGKey(1), cfg),
        "clf": init_classifier(jax.random.PRNGKey(1), 4, 3),
    }
    r_params, r_epoch, r_best, r_rng = restore_checkpoint(path, fresh)
    assert r_epoch == 12
    assert abs(r_best - 0.77) < 1e-9
    # params round-trip exactly
    flat_a = jax.tree_util.tree_leaves(jax.device_get(params))
    flat_b = jax.tree_util.tree_leaves(r_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # RNG resumes mid-stream
    np.testing.assert_array_equal(r_rng.rand(5), expected_next)


def test_resume_continues_from_checkpointed_epoch(tmp_path):
    """fit() must continue at the checkpointed epoch, not re-run the full
    count (code-review finding)."""
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig

    ds = synthetic_power_law(120, 500, num_feats=8, num_classes=3, seed=1)
    mcfg = GraphSageConfig(num_layers=1, input_size=8, out_size=8)
    tcfg = TrainConfig(learn_method="sup", epochs=2, b_sz=32, seed=3,
                       verbose=False)
    tr = Trainer(ds, mcfg, tcfg)
    tr.fit()
    path = str(tmp_path / "ck")
    save_checkpoint(path, tr.params, tr.epoch, tr.max_vali_f1, tr.rng)
    assert tr.epoch == 1  # last epoch ran

    tcfg2 = TrainConfig(learn_method="sup", epochs=4, b_sz=32, seed=3,
                        verbose=False)
    tr2 = Trainer(ds, mcfg, tcfg2)
    params, epoch, best, rng = restore_checkpoint(path, tr2.params)
    import jax.numpy as jnp
    tr2.params = jax.tree_util.tree_map(jnp.asarray, params)
    tr2.epoch = epoch + 1   # continue after the checkpointed epoch
    tr2.max_vali_f1 = best
    tr2.rng = rng
    tr2.fit()
    ran_epochs = [h["epoch"] for h in tr2.history]
    assert ran_epochs == [2, 3], ran_epochs


def test_cached_resume_matches_unbroken_run(tmp_path):
    """Cached-pipeline resume is bit-exact: checkpointing CachedTrainer's
    device PRNG key (the driver of in-jit sampling + the leaf-cache draw)
    makes the resumed run replay the unbroken run exactly (VERDICT r04
    weak #5 — previously true only for the compact pipeline)."""
    import jax.numpy as jnp

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train import CachedTrainer, TrainConfig

    ds = synthetic_power_law(120, 500, num_feats=8, num_classes=3, seed=1)
    mcfg = GraphSageConfig(num_layers=2, input_size=8, out_size=8)
    tcfg = TrainConfig(learn_method="sup", epochs=3, b_sz=32, seed=3,
                       verbose=False)

    tr_a = CachedTrainer(ds, mcfg, tcfg)
    tr_a.epoch = 0
    tr_a.train_epoch()
    tr_a.evaluate()
    path = str(tmp_path / "ck_cached")
    save_checkpoint(path, tr_a.params, 0, tr_a.max_vali_f1, tr_a.rng,
                    jax_key=tr_a._key)
    tr_a.epoch = 1
    loss_unbroken = tr_a.train_epoch()

    tr_b = CachedTrainer(ds, mcfg, tcfg)
    params, epoch, best, rng, key = restore_checkpoint(
        path, tr_b.params, with_jax_key=True)
    assert key is not None
    import jax.numpy as _jnp
    tr_b.params = jax.tree_util.tree_map(_jnp.asarray, params)
    tr_b.rng = rng
    tr_b.max_vali_f1 = best
    tr_b._key = jnp.asarray(key, dtype=jnp.uint32)
    tr_b.epoch = epoch + 1
    loss_resumed = tr_b.train_epoch()

    assert loss_resumed == loss_unbroken
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tr_a.params)),
                    jax.tree_util.tree_leaves(jax.device_get(tr_b.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_old_checkpoint_without_key_is_graceful(tmp_path):
    """A pre-round-5 checkpoint (no jax_key leaf) restores fine with
    with_jax_key=True — key comes back None, everything else intact."""
    cfg = GraphSageConfig(num_layers=1, input_size=4, out_size=4)
    params = {"sage": init_graphsage(jax.random.PRNGKey(0), cfg),
              "clf": init_classifier(jax.random.PRNGKey(0), 4, 2)}
    path = str(tmp_path / "old_ck")
    save_checkpoint(path, params, epoch=3, max_vali_f1=0.5,
                    rng=np.random.RandomState(1))  # no jax_key
    r_params, r_epoch, r_best, r_rng, key = restore_checkpoint(
        path, params, with_jax_key=True)
    assert key is None
    assert r_epoch == 3 and abs(r_best - 0.5) < 1e-9


def test_old_api_restores_key_bearing_checkpoint(tmp_path):
    """The 4-tuple restore API (with_jax_key=False) must tolerate a
    round-5 cached-pipeline checkpoint that carries the jax_key leaf —
    orbax rejects structure mismatches, so the restore falls back to the
    key-bearing target and discards the key."""
    cfg = GraphSageConfig(num_layers=1, input_size=4, out_size=4)
    params = {"sage": init_graphsage(jax.random.PRNGKey(0), cfg),
              "clf": init_classifier(jax.random.PRNGKey(0), 4, 2)}
    path = str(tmp_path / "ck_with_key")
    save_checkpoint(path, params, epoch=2, max_vali_f1=0.25,
                    rng=np.random.RandomState(5),
                    jax_key=jax.random.PRNGKey(7))
    r_params, r_epoch, r_best, r_rng = restore_checkpoint(path, params)
    assert r_epoch == 2 and abs(r_best - 0.25) < 1e-9
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(params)),
                    jax.tree_util.tree_leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
