"""Dense fully-on-device training pipeline — the TPU-scale path.

The compact trainer (train/trainer.py) mirrors the reference's host-driven
protocol for parity.  This module is the performance pipeline: sampling,
feature gather, L-layer encode, loss, grad, clip, and SGD are ONE jit'd XLA
program with static shapes; nothing returns to the host between steps.  Under
a `Mesh` the same program runs SPMD: the batch is sharded over the ``data``
axis and XLA inserts the gradient all-reduce; weights may additionally be
sharded over ``model`` (see parallel/mesh.py).

Replaces the per-batch host work of the reference (sampling
src/models.py:277-289, mask building :305-308, pair bookkeeping :135-148)
with `jax.random` tensor sampling (sampler/device.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from graphsage_tpu.losses import supervised_nll, unsup_loss_from_pairbatch
from graphsage_tpu.models import (
    GraphSageConfig,
    classifier_apply,
)
from graphsage_tpu.models.graphsage import graphsage_apply_gathered
from graphsage_tpu.sampler.device import sample_frontiers_dense
from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update


def cast_compute(tree, mcfg: GraphSageConfig):
    """Cast float32 leaves to the config's compute dtype (no-op for f32).

    Applied INSIDE the differentiated function so master params stay f32 and
    gradients flow back through the cast as f32 (standard mixed precision)."""
    cdtype = jnp.dtype(mcfg.compute_dtype)
    if cdtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x, tree)


def dense_forward(params, mcfg: GraphSageConfig, feats, neighbors, degrees,
                  batch, key, fanout: int = 10):
    """Sampling + encode for a batch of node ids: [B] -> [B, out_size]."""
    x0_ids, frontiers = sample_frontiers_dense(
        key, neighbors, degrees, batch, num_layers=mcfg.num_layers,
        fanout=fanout, gcn=mcfg.gcn)
    params = cast_compute(params, mcfg)
    feats = cast_compute(feats, mcfg)
    return graphsage_apply_gathered(params["sage"], mcfg, feats, x0_ids,
                                    frontiers)


def make_dense_sup_step(mcfg: GraphSageConfig, fanout: int = 10,
                        lr: float = 0.7, clip: float = 5.0):
    """Supervised train step: returns step(params, feats, neighbors,
    degrees, batch, labels, key) -> (params, loss).  jit it (optionally with
    shardings) at the call site."""

    def step(params, feats, neighbors, degrees, batch, labels, key):
        def loss_fn(p):
            embs = dense_forward(p, mcfg, feats, neighbors, degrees,
                                 batch, key, fanout)
            logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
            mask = jnp.ones(batch.shape[0], dtype=jnp.float32)
            return supervised_nll(logp, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
        return sgd_update(params, grads, lr), loss

    return step


def make_dense_unsup_step(mcfg: GraphSageConfig, unsup_loss: str = "normal",
                          fanout: int = 10, lr: float = 0.7,
                          clip: float = 5.0, learn_method: str = "unsup",
                          q: float = 10.0, margin: float = 3.0):
    """Unsupervised / plus_unsup train step on the dense pipeline.

    The batch is the *extended* batch (pair-endpoint union, reference
    src/models.py:135-148) and ``pairs`` are the fixed-shape PairBatch
    tensors (host-sampled walks/negatives) indexing into it.
    step(params, feats, neighbors, degrees, batch, labels, pairs, key,
    row_mask=None) -> (params, loss).  ``row_mask`` marks the REAL rows of
    the bucket-padded extended batch (PairBatch.unique_nodes pads with
    node 0 up to the bucket size); without it the plus_unsup NLL would
    average phantom copies of node 0's term into the supervised loss —
    pass ``(arange(U_pad) < pb.num_unique)`` exactly as the trainers'
    own steps do (same contract as make_cached_unsup_step)."""

    def step(params, feats, neighbors, degrees, batch, labels, pairs, key,
             row_mask=None):
        def loss_fn(p):
            embs = dense_forward(p, mcfg, feats, neighbors, degrees,
                                 batch, key, fanout)
            loss = unsup_loss_from_pairbatch(embs, pairs, unsup_loss,
                                             q=q, margin=margin)
            if learn_method == "plus_unsup":
                logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
                mask = (jnp.ones(batch.shape[0], dtype=jnp.float32)
                        if row_mask is None else row_mask)
                loss = loss + supervised_nll(logp, labels, mask)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
        return sgd_update(params, grads, lr), loss

    return step


def make_dense_sup_epoch(mcfg: GraphSageConfig, fanout: int = 10,
                         lr: float = 0.7, clip: float = 5.0):
    """Multi-step driver: `lax.scan` over a stack of batches so an entire
    sequence of train steps is ONE device program — no host round-trip per
    step (the production pattern; also what bench.py times).

    Returns epoch(params, feats, neighbors, degrees, batches [T, B],
    labels [T, B], key) -> (params, losses [T])."""
    step = make_dense_sup_step(mcfg, fanout=fanout, lr=lr, clip=clip)

    def epoch(params, feats, neighbors, degrees, batches, labels, key):
        def body(carry, xs):
            p, k = carry
            batch, lab = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, neighbors, degrees, batch, lab, sub)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(body, (params, key),
                                           (batches, labels))
        return params, losses

    return epoch


def edges_per_batch(batch_size: int, num_layers: int, fanout: int) -> int:
    """Aggregation edges processed per dense batch: each frontier node at
    depth d aggregates ≤ fanout neighbors; frontier sizes are
    B·(fanout+1)^d.  Upper-bound (full-degree) count, the unit for the
    edges/s benchmark."""
    total = 0
    width = batch_size
    for _ in range(num_layers):
        total += width * fanout
        width *= fanout + 1
    return total
