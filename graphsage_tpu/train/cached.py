"""Leaf-cached training pipeline — the TPU speed-of-light path for MEAN.

Motivation (measured on TPU v5e, 100k-node/1M-edge power-law, batch 4096):
the dense per-occurrence pipeline is bound by per-row dynamic addressing,
not FLOPs — XLA gathers run at ~170M rows/s and the backward scatter-add at
~60M rows/s, so a 2-layer step spends ~20 of its 24 ms moving 495k leaf
rows around (vs ~2 ms of matmul).  The fix is structural: make the leaf
level *addressing-free*.

Design ("hierarchical epoch cache"):

- Per EPOCH, draw one uniform ``fanout``-subset per node (device-side
  ``_sample_one_hop`` over all N rows of the padded table) and precompute

      mean_feats[v] = mean(feats[cache(v)])            # [N, D]

  — the depth-L neighborhood aggregation of RAW features, once.
- Per STEP, sample fresh frontiers for depths 0..L-2 only (the expensive
  10x leaf expansion never happens).  Layer 1 for a frontier node v is

      relu(W1 · [feats[v] ‖ mean_feats[v]])

  i.e. two row-gathers from *constant* tables — no parameter sits upstream
  of any gather, so autodiff emits pure GEMMs and ZERO scatters.  Layers
  2..L aggregate over the tree-contiguous frontiers as usual.

Sampling semantics vs the reference: the reference shares one sampled
neighborhood per unique node per BATCH (src/models.py:277-289 dedups);
this pipeline shares the depth-L sample per node per EPOCH (re-drawn
uniformly every epoch — the subset itself is exactly uniform
fanout-of-degree by the subsample composition argument, data/graph.py).
Depths < L keep fresh per-step sampling.  Quality is validated against the
per-step pipeline in tests/test_cached.py and BASELINE.md records full
50-epoch Cora F1 parity.

Aggregators: MEAN (the count-weighted gcn mix-in keeps gcn mode exact) and
MAX (elementwise max over the epoch-fixed leaf sample is itself a constant
table; gcn mode mixes the self row in with one more elementwise max).

LSTM runs as the **cached-LSTM hybrid** (``agg_func="LSTM"``): the exact
LSTM aggregator cannot ride the leaf cache (its cell parameters sit
upstream of the leaf gather, so a per-epoch cache would stale their
gradients), so the hybrid aggregates the LEAF level with the parameter-free
MEAN cache and runs the live LSTM cell at every upper level, where the
tree-contiguous frontiers are already materialized [U, K+1, H] sequences —
no gathers, no scatters, full per-step gradients for every LSTM cell that
actually runs.  This is a deliberate model variant (layer-1 MEAN +
layers-2..L LSTM), not an approximation of the dense LSTM model; the dense
pipeline keeps the all-LSTM reference-shaped model.  Slot order inside a
sequence is the sampler's uniform-random pick order (the GraphSAGE paper's
random permutation).  The layer-0 LSTM cell parameters created by
init_graphsage are untouched by the hybrid (zero gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.losses import supervised_nll, unsup_loss_from_pairbatch
from graphsage_tpu.models import GraphSageConfig, classifier_apply
from graphsage_tpu.models.layers import sage_layer_apply
from graphsage_tpu.models.lstm_agg import lstm_scan
from graphsage_tpu.ops.aggregate import max_aggregate, mean_aggregate
from graphsage_tpu.sampler.device import _sample_one_hop, sample_frontiers_dense
from graphsage_tpu.train.dense import cast_compute
from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update


def refresh_leaf_cache(key: jax.Array, feats: jax.Array, neighbors: jax.Array,
                       degrees: jax.Array, fanout: int, agg: str = "MEAN",
                       max_gather_bytes: int = 4 << 30,
                       block: int | None = None):
    """Per-epoch cache refresh, fully on device (~29 ms at 100k nodes).

    Returns (agg_feats [N, D], cache_count [N]): the masked mean (or
    elementwise max, ``agg="MAX"``; any other value — incl. the LSTM
    hybrid — caches the mean) of raw features over a fresh uniform
    ``fanout``-subset per node, and the number of valid slots (needed for
    the exact gcn self mix-in / emptiness test).  jit this once and call at
    every epoch boundary.

    The aggregation gathers a ``[rows, fanout, D]`` temp; when that would
    exceed ``max_gather_bytes`` (a 1M-node D=602 graph needs 24 GB) the
    refresh runs as a `lax.scan` over node blocks, bounding peak HBM while
    keeping identical per-node sampling semantics.  Scan blocks budget
    1 GB of gather temp: TPU (8,128) tiling pads the [block, fanout, D]
    temp up to ~1.7x (fanout 10 -> 16 sublanes), so a larger block OOMs
    next to the feature/cache tables themselves at 1M-node scale.
    """
    n = neighbors.shape[0]
    d = feats.shape[1]

    def block_fn(k, ids):
        samples, valid = _sample_one_hop(k, neighbors, degrees, ids, fanout)
        # self-loop samples drop out of the aggregation set, matching the
        # dense sampler's not_self mask (reference set dance,
        # src/models.py:285,297-298)
        valid = valid & (samples != ids[:, None])
        mask = valid.astype(feats.dtype)
        if agg == "MAX":
            agg_feats = max_aggregate(feats, samples, mask)
        else:
            agg_feats = mean_aggregate(feats, samples, mask)
        return agg_feats, jnp.sum(mask, axis=1)

    row_bytes = fanout * d * jnp.dtype(feats.dtype).itemsize
    if block is None:
        if n * row_bytes <= max_gather_bytes:
            return block_fn(key, jnp.arange(n, dtype=jnp.int32))
        block = max(1024, min(n, int((1 << 30) // row_bytes)))
        block -= block % 8  # sublane-aligned blocks tile cleanly
    nb = -(-n // block)
    # tail ids clamp to n-1: those rows recompute node n-1's aggregation
    # and are sliced off below (first occurrence of every node id wins)
    ids = jnp.minimum(jnp.arange(nb * block, dtype=jnp.int32), n - 1)
    keys = jax.random.split(key, nb)

    def body(carry, xs):
        k, idb = xs
        return carry, block_fn(k, idb)

    _, (agg_blocks, cnt_blocks) = jax.lax.scan(
        body, None, (keys, ids.reshape(nb, block)))
    return agg_blocks.reshape(nb * block, d)[:n], cnt_blocks.reshape(-1)[:n]


def _gcn_mix(self_f, agg_f, cnt, is_max: bool):
    """gcn aggregates over sample ∪ self (src/models.py:297-298): exact
    count-weighted mix of the cached mean, or one more elementwise max for
    MAX (empty sample → self alone, matching ops/aggregate semantics)."""
    cnt = cnt[..., None] if cnt.ndim == self_f.ndim - 1 else cnt
    cnt = cnt.astype(self_f.dtype)
    if is_max:
        return jnp.where(cnt > 0, jnp.maximum(agg_f, self_f), self_f)
    return (cnt * agg_f + self_f) / (cnt + 1.0)


def cached_forward(params, mcfg: GraphSageConfig, feats, cache_feats,
                   cache_count, neighbors, degrees, batch, key,
                   fanout: int = 10):
    """Encode a batch of node ids: [B] -> [B, out_size].

    ``feats``/``cache_feats``/``cache_count`` are the epoch-constant tables
    (``cache_feats`` = mean or elementwise-max of the leaf sample per
    ``mcfg.agg_func``, from :func:`refresh_leaf_cache`); everything else
    matches dense_forward's contract.
    """
    assert mcfg.agg_func in ("MEAN", "MAX", "LSTM"), mcfg.agg_func
    # LSTM = the cached-LSTM hybrid (module docstring): leaf level from the
    # MEAN cache, live LSTM cells at the upper levels.
    is_max = mcfg.agg_func == "MAX"
    params = cast_compute(params, mcfg)
    feats = cast_compute(feats, mcfg)
    cache_feats = cast_compute(cache_feats, mcfg)
    sage = params["sage"]

    if mcfg.num_layers == 1:
        ids = jnp.asarray(batch, jnp.int32)
        frontiers = []
    else:
        ids, frontiers = sample_frontiers_dense(
            key, neighbors, degrees, batch,
            num_layers=mcfg.num_layers - 1, fanout=fanout, gcn=mcfg.gcn)

    # Layer 1 from the cached leaf aggregation.  Two equivalent orders:
    #
    # per-occurrence: gather [M, D] rows from the constant tables, then
    #   GEMM.  Wide-row gathers are byte-bound (~42-67 GB/s measured);
    #   cost ∝ M·2D random bytes.  No scatter in the backward (tables are
    #   constant).
    # full-table: compute relu(W1·[feats ‖ meanF]) for ALL N nodes (the
    #   tables are read SEQUENTIALLY by the GEMM at full HBM bandwidth,
    #   measured ~16x the random-row rate), then gather M narrow [H]-wide
    #   rows; the backward adds a d(H1)-scatter of M rows (~2 more random
    #   [H]-row moves).
    #
    # Both static shapes are known at trace time; pick by the byte cost
    # model (random-access units): full-table ≈ N·2D/16 + 3·M·H vs
    # per-occurrence ≈ M·2D.  At D=602, H=128 the crossover is M ≈ N/11 —
    # NOT M ≥ N (PROFILE_CACHED.json / BASELINE.md round-2 analysis).
    m1 = ids.shape[0]
    n = feats.shape[0]
    w1 = sage["layers"][0]
    # both branches move BOTH tables in every mode: per-occurrence gathers
    # a feats row AND a cache_feats row per id, full-table reads both
    # sequentially — so the byte model uses 2D for gcn too (the gcn
    # difference is the W shape, not the table traffic; using D here
    # relatively doubled the 3·m1·H term and mis-steered near-crossover
    # gcn batches to the slower branch)
    feat2 = 2 * feats.shape[1]
    hdim1 = w1["weight"].shape[0]
    full_table = n * feat2 / 16 + 3 * m1 * hdim1 < m1 * feat2
    if mcfg.gcn:
        if full_table:
            mixed_t = _gcn_mix(feats, cache_feats, cache_count, is_max)
            h1_table = sage_layer_apply(w1, mixed_t, mixed_t, gcn=True)
            h = jnp.take(h1_table, ids, axis=0)
        else:
            self_f = jnp.take(feats, ids, axis=0)
            agg_f = jnp.take(cache_feats, ids, axis=0)
            cnt = jnp.take(cache_count, ids, axis=0)
            mixed = _gcn_mix(self_f, agg_f, cnt, is_max)
            h = sage_layer_apply(w1, mixed, mixed, gcn=True)
    else:
        if full_table:
            h1_table = sage_layer_apply(w1, feats, cache_feats, gcn=False)
            h = jnp.take(h1_table, ids, axis=0)
        else:
            self_f = jnp.take(feats, ids, axis=0)
            agg_f = jnp.take(cache_feats, ids, axis=0)
            h = sage_layer_apply(w1, self_f, agg_f, gcn=False)

    return _upper_layers(sage, h, frontiers, fanout, mcfg.agg_func,
                         mcfg.gcn)


def _upper_layers(sage, h, frontiers, fanout: int, agg_func: str, gcn: bool):
    """Layers 2..L: the dense tree stores the children of parent u at rows
    [u·(K+1), (u+1)·(K+1)) with slot 0 = self, so aggregation is a pure
    reshape + masked reduce — no index ops, hence no gather/scatter
    anywhere above layer 1 (asserted in tests/test_cached.py).  LSTM
    (hybrid mode) scans the K+1 slot sequence live with the layer's cell
    parameters — still no index ops, and the mask skips the self slot
    exactly as the dense pipeline's lstm_aggregate does (slot-0 mask 0
    unless gcn).  Shared by the single-device cached forward and the
    sharded epoch (train/cached_dist.py)."""
    k = fanout
    for li, frontier in enumerate(frontiers, start=1):
        hdim = h.shape[1]
        hr = h.reshape(-1, k + 1, hdim)
        mask = frontier.mask.astype(h.dtype)              # [U, K+1]
        if agg_func == "MAX":
            neg = jnp.asarray(-jnp.inf, h.dtype)
            agg = jnp.max(jnp.where(mask[..., None] > 0, hr, neg), axis=1)
            any_valid = jnp.any(mask > 0, axis=1, keepdims=True)
            agg = jnp.where(any_valid, agg, jnp.zeros_like(agg))
        elif agg_func == "LSTM":
            agg = lstm_scan(sage["agg"][li], hr, mask)
        else:
            cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
            agg = jnp.einsum("ukh,uk->uh", hr, mask) / cnt
        h = sage_layer_apply(sage["layers"][li], hr[:, 0], agg, gcn=gcn)
    return h


def make_cached_sup_step(mcfg: GraphSageConfig, fanout: int = 10,
                         lr: float = 0.7, clip: float = 5.0):
    """Supervised step on the leaf-cached pipeline.  Signature:
    step(params, feats, cache_feats, cache_count, neighbors, degrees,
    batch, labels, key) -> (params, loss)."""

    def step(params, feats, cache_feats, cache_count, neighbors, degrees,
             batch, labels, key, row_mask=None):
        def loss_fn(p):
            embs = cached_forward(p, mcfg, feats, cache_feats, cache_count,
                                  neighbors, degrees, batch, key, fanout)
            logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
            mask = (jnp.ones(batch.shape[0], dtype=jnp.float32)
                    if row_mask is None else row_mask)
            return supervised_nll(logp, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
        return sgd_update(params, grads, lr), loss

    return step


def make_cached_unsup_step(mcfg: GraphSageConfig, unsup_loss: str = "normal",
                           fanout: int = 10, lr: float = 0.7,
                           clip: float = 5.0, learn_method: str = "unsup",
                           q: float = 10.0, margin: float = 3.0):
    """Unsup / plus_unsup step on the leaf-cached pipeline (same pair
    tensor contract as make_dense_unsup_step)."""

    def step(params, feats, cache_feats, cache_count, neighbors, degrees,
             batch, labels, pairs, key, row_mask=None):
        def loss_fn(p):
            embs = cached_forward(p, mcfg, feats, cache_feats, cache_count,
                                  neighbors, degrees, batch, key, fanout)
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


def make_cached_sup_epoch(mcfg: GraphSageConfig, fanout: int = 10,
                          lr: float = 0.7, clip: float = 5.0):
    """Whole-epoch driver: refresh the leaf cache, then `lax.scan` the
    step over a [T, B] batch stack — refresh + T steps is ONE XLA program.

    epoch(params, feats, neighbors, degrees, batches [T, B], labels [T, B],
    key) -> (params, losses [T])."""
    step = make_cached_sup_step(mcfg, fanout=fanout, lr=lr, clip=clip)

    def epoch(params, feats, neighbors, degrees, batches, labels, key,
              row_masks=None):
        k_cache, k_steps = jax.random.split(key)
        cache_feats, cache_count = refresh_leaf_cache(
            k_cache, feats, neighbors, degrees, fanout, agg=mcfg.agg_func)
        if row_masks is None:
            row_masks = jnp.ones(batches.shape, jnp.float32)

        def body(carry, xs):
            p, k = carry
            batch, lab, rmask = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cache_feats, cache_count, neighbors,
                           degrees, batch, lab, sub, rmask)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(body, (params, k_steps),
                                           (batches, labels, row_masks))
        return params, losses

    return epoch


def make_cached_sup_epoch_reuse(mcfg: GraphSageConfig, fanout: int = 10,
                                lr: float = 0.7, clip: float = 5.0):
    """Epoch driver that REUSES a caller-held leaf cache instead of
    refreshing: cache staleness across epochs (``refresh_every`` k > 1)
    amortizes the refresh — the 1M-node workload's single biggest cost
    slice (PROFILE_BIGSCALE.json: 375 ms/refresh = 47 ms/step at the
    honest T=8) — over k epochs.  Sampling semantics: the depth-L subset
    stays fixed for k epochs instead of 1 (still exactly uniform per
    draw); depths < L keep fresh per-step sampling.  Quality vs k is
    measured in STALENESS_r04.json.

    epoch(params, feats, cache_feats, cache_count, neighbors, degrees,
    batches [T, B], labels [T, B], key, row_masks) -> (params, losses)."""
    step = make_cached_sup_step(mcfg, fanout=fanout, lr=lr, clip=clip)

    def epoch(params, feats, cache_feats, cache_count, neighbors, degrees,
              batches, labels, key, row_masks=None):
        if row_masks is None:
            row_masks = jnp.ones(batches.shape, jnp.float32)

        def body(carry, xs):
            p, k = carry
            batch, lab, rmask = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cache_feats, cache_count, neighbors,
                           degrees, batch, lab, sub, rmask)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(body, (params, key),
                                           (batches, labels, row_masks))
        return params, losses

    return epoch


def make_cached_unsup_epoch_reuse(mcfg: GraphSageConfig,
                                  unsup_loss: str = "normal",
                                  fanout: int = 10, lr: float = 0.7,
                                  clip: float = 5.0,
                                  learn_method: str = "unsup",
                                  q: float = 10.0, margin: float = 3.0):
    """Unsup/plus_unsup variant of :func:`make_cached_sup_epoch_reuse`
    (same pair-tensor contract as make_cached_unsup_epoch)."""
    step = make_cached_unsup_step(mcfg, unsup_loss=unsup_loss,
                                  fanout=fanout, lr=lr, clip=clip,
                                  learn_method=learn_method, q=q,
                                  margin=margin)

    def epoch(params, feats, cache_feats, cache_count, neighbors, degrees,
              batches, labels, pair_stack, row_masks, key):
        def body(carry, xs):
            p, k = carry
            batch, lab, pairs, rmask = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cache_feats, cache_count, neighbors,
                           degrees, batch, lab, pairs, sub, rmask)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(
            body, (params, key), (batches, labels, pair_stack, row_masks))
        return params, losses

    return epoch


def make_cached_unsup_epoch(mcfg: GraphSageConfig,
                            unsup_loss: str = "normal", fanout: int = 10,
                            lr: float = 0.7, clip: float = 5.0,
                            learn_method: str = "unsup", q: float = 10.0,
                            margin: float = 3.0):
    """Whole-epoch unsup / plus_unsup driver: refresh the leaf cache, then
    `lax.scan` the step over stacked extended batches + pair tensors.

    epoch(params, feats, neighbors, degrees, batches [T, U], labels [T, U],
    pair_stack {field: [T, ...]}, row_masks [T, U], key)
    -> (params, losses [T]).  ``batches`` rows are the EXTENDED batches
    (union of pair endpoints, reference src/models.py:135-148); pair index
    fields point at rows of each step's extended-batch embedding matrix.
    """
    step = make_cached_unsup_step(mcfg, unsup_loss=unsup_loss,
                                  fanout=fanout, lr=lr, clip=clip,
                                  learn_method=learn_method, q=q,
                                  margin=margin)

    def epoch(params, feats, neighbors, degrees, batches, labels,
              pair_stack, row_masks, key):
        k_cache, k_steps = jax.random.split(key)
        cache_feats, cache_count = refresh_leaf_cache(
            k_cache, feats, neighbors, degrees, fanout, agg=mcfg.agg_func)

        def body(carry, xs):
            p, k = carry
            batch, lab, pairs, rmask = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cache_feats, cache_count, neighbors,
                           degrees, batch, lab, pairs, sub, rmask)
            return (p, k), loss

        (params, _), losses = jax.lax.scan(
            body, (params, k_steps), (batches, labels, pair_stack,
                                      row_masks))
        return params, losses

    return epoch
