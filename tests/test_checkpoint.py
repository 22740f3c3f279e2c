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
