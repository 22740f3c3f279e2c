"""Mixed-precision (bfloat16 compute) invariants and quality parity.

The bf16 mode (GraphSageConfig.compute_dtype="bfloat16") is the MXU-native
configuration: master params stay float32, the forward/backward runs in
bf16 with f32 matmul accumulation (preferred_element_type), and loss
reductions are forced to f32.  No reference counterpart (the torch
reference is f32 end-to-end, src/main.py:52); the bar here is parity with
our own f32 pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import classifier_apply, init_classifier
from graphsage_tpu.train.dense import (
    dense_forward,
    make_dense_sup_epoch,
    make_dense_sup_step,
)
from graphsage_tpu.train.metrics import micro_f1


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_power_law(400, 2400, num_feats=32, num_classes=4, seed=7)
    pad = ds.graph.to_padded(cap=16)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    return ds, pad, k1, k2


def _mcfg(dtype):
    return GraphSageConfig(num_layers=2, input_size=32, out_size=32,
                           compute_dtype=dtype)


def _params(k1, k2, mcfg, n_classes=4):
    return {"sage": init_graphsage(k1, mcfg),
            "clf": init_classifier(k2, mcfg.out_size, n_classes)}


def test_bf16_step_dtypes_and_loss_close(setup):
    ds, pad, k1, k2 = setup
    batch = jnp.arange(48, dtype=jnp.int32)
    labels = jnp.asarray(ds.labels[:48].astype(np.int32))
    args = (jnp.asarray(ds.features), jnp.asarray(pad.neighbors),
            jnp.asarray(pad.degrees), batch, labels, jax.random.PRNGKey(9))

    losses = {}
    for dtype in ("float32", "bfloat16"):
        mcfg = _mcfg(dtype)
        params = _params(k1, k2, mcfg)
        step = jax.jit(make_dense_sup_step(mcfg, fanout=5))
        p2, loss = step(params, *args)
        losses[dtype] = float(loss)
        # master weights and gradient updates stay f32
        for leaf in jax.tree_util.tree_leaves(p2):
            assert leaf.dtype == jnp.float32
        # loss itself is a f32 reduction
        assert loss.dtype == jnp.float32
    # same RNG key → identical sampled frontiers → losses differ only by
    # rounding of the bf16 matmuls
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.02 * max(
        1.0, abs(losses["float32"]))


def test_bf16_forward_close_to_f32(setup):
    ds, pad, k1, k2 = setup
    batch = jnp.arange(64, dtype=jnp.int32)
    outs = {}
    for dtype in ("float32", "bfloat16"):
        mcfg = _mcfg(dtype)
        params = _params(k1, k2, mcfg)
        embs = dense_forward(params, mcfg, jnp.asarray(ds.features),
                             jnp.asarray(pad.neighbors),
                             jnp.asarray(pad.degrees), batch,
                             jax.random.PRNGKey(11), fanout=5)
        outs[dtype] = np.asarray(embs, dtype=np.float32)
    assert outs["bfloat16"].dtype == np.float32
    scale = np.abs(outs["float32"]).max() + 1e-6
    rel = np.abs(outs["bfloat16"] - outs["float32"]).max() / scale
    assert rel < 0.05, rel  # bf16 has ~3 significant decimal digits


def test_bf16_training_f1_parity(setup):
    """Short supervised fit in both dtypes: bf16 val F1 within noise of
    f32 (the VERDICT-4 'verify F1 parity within noise' gate)."""
    ds, pad, k1, k2 = setup
    rng = np.random.RandomState(5)
    t, b = 30, 64
    batches = jnp.asarray(rng.choice(ds.train_nodes, (t, b)).astype(np.int32))
    labels = jnp.asarray(ds.labels.astype(np.int32))[batches]
    f1s = {}
    for dtype in ("float32", "bfloat16"):
        mcfg = _mcfg(dtype)
        params = _params(k1, k2, mcfg)
        epoch_fn = jax.jit(make_dense_sup_epoch(mcfg, fanout=5, lr=0.5))
        for ep in range(3):
            params, _ = epoch_fn(params, jnp.asarray(ds.features),
                                 jnp.asarray(pad.neighbors),
                                 jnp.asarray(pad.degrees), batches, labels,
                                 jax.random.PRNGKey(100 + ep))
        val = ds.val_nodes
        embs = dense_forward(params, mcfg, jnp.asarray(ds.features),
                             jnp.asarray(pad.neighbors),
                             jnp.asarray(pad.degrees),
                             jnp.asarray(val.astype(np.int32)),
                             jax.random.PRNGKey(999), fanout=5)
        pred = np.asarray(jnp.argmax(
            classifier_apply(params["clf"], embs), axis=1))
        f1s[dtype] = micro_f1(ds.labels[val], pred)
    assert f1s["bfloat16"] >= f1s["float32"] - 0.05, f1s
