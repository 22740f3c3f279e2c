"""Sharded leaf-cached training: the flagship throughput pipeline over a
device mesh.

The single-chip cached step (train/cached.py) is bound by the layer-1
backward — a scatter-add of d(h1_table): M random [H]-row read-modify-
writes per step (PROFILE_CACHED.json: 6.4 ms of the 10 ms B=32768 step).
That op has no faster exact single-chip formulation (every alternative is
a sort, a wide gather, or a one-hot GEMM — all measured slower), but it
parallelizes perfectly: shard the node-table ROWS over the mesh and every
per-row cost divides by the device count while the collectives ride ICI
in narrow H-space.

Per-device program (shard_map over the ``data`` axis, P = n_devices):

- refresh: each device draws + aggregates the leaf cache for its OWN
  N/P-row range (per-epoch work / P; no collective — full-table layer 1
  only ever reads local cache rows);
- layer 1 forward: ``h1_local = relu(W1·[X_local ‖ C_local])`` — an
  N/P-row sequential GEMM — then ``all_gather(h1_local)`` assembles the
  [N, H] activation table (N·H·2 bytes over ICI, D/H-fold smaller than
  gathering features);
- layers 2..L, loss: device-local over the device's batch shard
  (per-device in-jit sampling, B/P rows);
- backward (autodiff of the above): each device scatter-adds only its
  OWN M/P rows into [N, H]; the all_gather transposes to a
  ``psum_scatter``, landing each device its local d(h1) shard; the dW1
  GEMM runs over local rows; ``pmean`` inside the loss makes the final
  grads replicated.  The bottleneck scatter is P-way parallel.

Tables (feats/neighbors/degrees) stay replicated — at config-5 scale
(1M × 602 f32 = 2.4 GB) they fit HBM; the memory-partitioned story is the
halo pipeline (train/distributed.py).  This module shards the COMPUTE.

One epoch is ONE XLA program: refresh + `lax.scan` over the step stack,
same contract as train/cached.py's epoch drivers with a [n_dev] axis
inserted in the batch tensors.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphsage_tpu.losses import supervised_nll, unsup_loss_from_pairbatch
from graphsage_tpu.models import GraphSageConfig, classifier_apply
from graphsage_tpu.models.layers import sage_layer_apply
from graphsage_tpu.ops.aggregate import max_aggregate, mean_aggregate
from graphsage_tpu.sampler.device import _sample_one_hop, sample_frontiers_dense
from graphsage_tpu.train.cached import _gcn_mix, _upper_layers
from graphsage_tpu.train.dense import cast_compute
from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update


# --------------------------------------------------------------------- host
def pad_node_tables(feats: np.ndarray, neighbors: np.ndarray,
                    degrees: np.ndarray, n_dev: int):
    """Pad the [N, ...] node tables to a multiple of n_dev rows so they
    shard evenly.  Padded rows have degree 0 (never sampled — adjacency
    only points at real nodes — and their cache/h1 rows are all-zero)."""
    n = feats.shape[0]
    n_pad = -(-n // n_dev) * n_dev
    if n_pad == n:
        return feats, neighbors, degrees
    extra = n_pad - n
    feats = np.concatenate(
        [feats, np.zeros((extra, feats.shape[1]), feats.dtype)])
    neighbors = np.concatenate(
        [neighbors, np.zeros((extra, neighbors.shape[1]), neighbors.dtype)])
    degrees = np.concatenate([degrees, np.zeros(extra, degrees.dtype)])
    return feats, neighbors, degrees


def build_epoch_stack(train_nodes: np.ndarray, labels: np.ndarray,
                      n_dev: int, b_sz: int, rng: np.random.RandomState):
    """Shuffle + pack one epoch into sharded step tensors.

    Returns (batches [T, n_dev, b_loc] int32, labels [T, n_dev, b_loc]
    int32, row_masks [T, n_dev, b_loc] f32) where b_loc = b_sz // n_dev;
    the wrap-padded tail rows carry row_mask 0 (same semantics as the
    single-device epoch driver's masked tail)."""
    assert b_sz % n_dev == 0, (b_sz, n_dev)
    order = rng.permutation(train_nodes).astype(np.int32)
    t = -(-len(order) // b_sz)
    padded = np.resize(order, t * b_sz)
    masks = np.ones(t * b_sz, np.float32)
    masks[len(order):] = 0.0
    batches = padded.reshape(t, n_dev, b_sz // n_dev)
    row_masks = masks.reshape(t, n_dev, b_sz // n_dev)
    labs = labels[batches].astype(np.int32)
    return batches, labs, row_masks


def build_unsup_epoch_stack(pair_sampler, train_nodes: np.ndarray,
                            labels: np.ndarray, n_dev: int, b_sz: int,
                            num_neg: int, rng: np.random.RandomState):
    """Shuffle + pack one unsup/plus_unsup epoch: per step and device,
    extend the b_loc-node chunk with walk-positive / BFS-negative pair
    endpoints (reference src/models.py:135-148) and pad the extended
    batches to one common width.

    Returns (batches [T, n_dev, U], labels [T, n_dev, U],
    row_masks [T, n_dev, U], pair_stack {field: [T, n_dev, ...]}).
    The tail chunk smaller than one device grid is dropped (DistTrainer's
    epoch policy).  Pair index fields point at rows of each device's own
    extended-batch embedding matrix."""
    from graphsage_tpu.sampler.compact import _bucket

    assert b_sz % n_dev == 0, (b_sz, n_dev)
    b_loc = b_sz // n_dev
    order = rng.permutation(train_nodes).astype(np.int64)
    t_steps = max(1, len(order) // b_sz)
    pbs = [[pair_sampler.sample_batch(
        order[t * b_sz + d * b_loc:t * b_sz + (d + 1) * b_loc],
        num_neg, rng) for d in range(n_dev)] for t in range(t_steps)]
    u_max = _bucket(max(pb.unique_nodes.shape[0]
                        for row in pbs for pb in row))
    batches = np.zeros((t_steps, n_dev, u_max), np.int32)
    labs = np.zeros((t_steps, n_dev, u_max), np.int32)
    row_masks = np.zeros((t_steps, n_dev, u_max), np.float32)
    fields = ("pos_q", "pos_mask", "neg_q", "neg_mask",
              "node_valid", "target_rows")
    stacked = {f: [] for f in fields}
    for t in range(t_steps):
        for d in range(n_dev):
            pb = pbs[t][d]
            u = pb.unique_nodes.shape[0]
            batches[t, d, :u] = pb.unique_nodes
            labs[t, d, :pb.num_unique] = labels[
                pb.unique_nodes[:pb.num_unique]]
            row_masks[t, d, :pb.num_unique] = 1.0
    def pad_rows(arr: np.ndarray) -> np.ndarray:
        # forced single-step epochs (train split < one b_sz grid) produce
        # chunks shorter than b_loc: pad the per-target pair rows with
        # zero-mask rows so stacking is rectangular and padded targets
        # contribute exactly zero loss (same scheme as the single-device
        # _stack_pair_batches in cached_trainer.py)
        b = arr.shape[0]
        if b < b_loc:
            arr = np.concatenate(
                [arr, np.zeros((b_loc - b,) + arr.shape[1:], arr.dtype)],
                axis=0)
        return arr

    for f in fields:
        stacked[f] = np.stack(
            [np.stack([pad_rows(np.asarray(getattr(pbs[t][d], f)))
                       for d in range(n_dev)]) for t in range(t_steps)])
    pair_stack = {f: jnp.asarray(v) for f, v in stacked.items()}
    return (jnp.asarray(batches), jnp.asarray(labs),
            jnp.asarray(row_masks), pair_stack)


# ------------------------------------------------------------------- device
def _local_refresh(key, feats, neighbors, degrees, fanout: int,
                   is_max: bool, idx, n_dev: int):
    """Per-epoch leaf-cache refresh over THIS device's row range
    (work / P; same sampling semantics as refresh_leaf_cache)."""
    rows_per = feats.shape[0] // n_dev
    r0 = idx * rows_per
    ids_local = r0 + jnp.arange(rows_per, dtype=jnp.int32)
    samples, valid = _sample_one_hop(
        jax.random.fold_in(key, idx), neighbors, degrees, ids_local,
        fanout)
    # self-loop samples drop out of the aggregation set (reference set
    # dance, src/models.py:285,297-298 — same as refresh_leaf_cache)
    valid = valid & (samples != ids_local[:, None])
    mask = valid.astype(feats.dtype)
    cache_local = (max_aggregate if is_max else mean_aggregate)(
        feats, samples, mask)                      # [rows_per, D]
    cnt_local = jnp.sum(mask, axis=1)
    x_local = jax.lax.dynamic_slice_in_dim(feats, r0, rows_per, axis=0)
    return x_local, cache_local, cnt_local


def _sharded_forward(pp, mcfg: GraphSageConfig, x_local, cache_local,
                     cnt_local, neighbors, degrees, batch, k_dev,
                     fanout: int, axis: str, is_max: bool):
    """Encode this device's batch shard: local layer-1 table GEMM,
    all_gather of the [N, H] activation table (backward transposes to a
    psum_scatter — the P-way-split d(h1) scatter), then device-local
    upper layers over fresh per-device frontiers."""
    xl = cast_compute(x_local, mcfg)
    cl = cast_compute(cache_local, mcfg)
    w1 = pp["sage"]["layers"][0]
    if mcfg.gcn:
        mixed = _gcn_mix(xl, cl, cnt_local, is_max)
        h1_local = sage_layer_apply(w1, mixed, mixed, gcn=True)
    else:
        h1_local = sage_layer_apply(w1, xl, cl, gcn=False)
    h1_full = jax.lax.all_gather(h1_local, axis, axis=0, tiled=True)
    if mcfg.num_layers == 1:
        ids, frontiers = jnp.asarray(batch, jnp.int32), []
    else:
        ids, frontiers = sample_frontiers_dense(
            k_dev, neighbors, degrees, batch,
            num_layers=mcfg.num_layers - 1, fanout=fanout, gcn=mcfg.gcn)
    h = jnp.take(h1_full, ids, axis=0)
    return _upper_layers(pp["sage"], h, frontiers, fanout, mcfg.agg_func,
                         mcfg.gcn)


def make_cached_dist_refresh(mcfg: GraphSageConfig, mesh: Mesh,
                             fanout: int = 10, axis: str = "data"):
    """Standalone sharded leaf-cache refresh for refresh_every=k > 1
    (cache staleness on the sharded pipeline, mirroring train/cached.py's
    reuse drivers): each device draws + aggregates its OWN N/P-row range.

    refresh(key, feats, neighbors, degrees) -> (cache [N, D] row-sharded,
    cnt [N] row-sharded) — feed both to the reuse-mode epoch program."""
    n_dev = mesh.shape[axis]
    is_max = mcfg.agg_func == "MAX"

    def local_refresh(key, feats, neighbors, degrees):
        idx = jax.lax.axis_index(axis)
        _, cache_local, cnt_local = _local_refresh(
            key, feats, neighbors, degrees, fanout, is_max, idx, n_dev)
        return cache_local, cnt_local

    sharded = shard_map(
        local_refresh, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(axis, None), P(axis)))
    return jax.jit(sharded)


def make_cached_dist_epoch(mcfg: GraphSageConfig, mesh: Mesh,
                           fanout: int = 10, lr: float = 0.7,
                           clip: float = 5.0, axis: str = "data",
                           reuse_cache: bool = False):
    """Sharded supervised cached-epoch program.

    epoch(params, feats, neighbors, degrees, batches [T, n_dev, b_loc],
    labels [T, n_dev, b_loc], row_masks [T, n_dev, b_loc], key)
    -> (params, losses [T]).  params/tables replicated; batch tensors
    sharded over ``axis``; tables must be pre-padded to a multiple of
    n_dev rows (pad_node_tables).

    ``reuse_cache=True`` (refresh_every=k > 1): the program takes
    (cache [N, D], cnt [N]) row-sharded inputs after ``degrees`` instead
    of refreshing — epoch(params, feats, neighbors, degrees, cache, cnt,
    batches, labels, row_masks, key).
    """
    n_dev = mesh.shape[axis]
    is_max = mcfg.agg_func == "MAX"
    # LSTM = cached-LSTM hybrid (train/cached.py docstring): MEAN leaf
    # cache (is_max False), live LSTM cells in _upper_layers.
    assert mcfg.agg_func in ("MEAN", "MAX", "LSTM"), mcfg.agg_func

    def local_epoch(params, feats, neighbors, degrees, *rest):
        if reuse_cache:
            cache_local, cnt_local, batches, labels, row_masks, key = rest
            rows_per = feats.shape[0] // n_dev
            idx = jax.lax.axis_index(axis)
            x_local = jax.lax.dynamic_slice_in_dim(
                feats, idx * rows_per, rows_per, axis=0)
            k_steps = key
        else:
            batches, labels, row_masks, key = rest
            idx = jax.lax.axis_index(axis)
            k_cache, k_steps = jax.random.split(key)
            x_local, cache_local, cnt_local = _local_refresh(
                k_cache, feats, neighbors, degrees, fanout, is_max, idx,
                n_dev)
        batches = batches[:, 0]                    # [T, b_loc] local shard
        labels, row_masks = labels[:, 0], row_masks[:, 0]

        def step(p, batch, lab, rmask, k_dev):
            def loss_fn(pp):
                pp = cast_compute(pp, mcfg)
                h = _sharded_forward(pp, mcfg, x_local, cache_local,
                                     cnt_local, neighbors, degrees, batch,
                                     k_dev, fanout, axis, is_max)
                logp = classifier_apply(pp["clf"], h)
                # pmean INSIDE the differentiated function so autodiff
                # inserts the gradient collective (train/distributed.py's
                # unreduced-vma note)
                return jax.lax.pmean(
                    supervised_nll(logp, lab, rmask), axis)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = {k: clip_by_global_norm(g, clip)
                     for k, g in grads.items()}
            return sgd_update(p, grads, lr), loss

        def body(carry, xs):
            p, k = carry
            batch, lab, rmask = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, batch, lab, rmask,
                           jax.random.fold_in(sub, idx))
            return (p, k), loss

        (params, _), losses = jax.lax.scan(
            body, (params, k_steps), (batches, labels, row_masks))
        return params, losses

    stack_specs = (P(None, axis, None), P(None, axis, None),
                   P(None, axis, None), P())
    cache_specs = (P(axis, None), P(axis)) if reuse_cache else ()
    sharded = shard_map(
        local_epoch, mesh=mesh,
        in_specs=(P(), P(), P(), P()) + cache_specs + stack_specs,
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def make_cached_dist_unsup_epoch(mcfg: GraphSageConfig, mesh: Mesh,
                                 unsup_loss: str = "normal",
                                 fanout: int = 10, lr: float = 0.7,
                                 clip: float = 5.0,
                                 learn_method: str = "unsup",
                                 q: float = 10.0, margin: float = 3.0,
                                 axis: str = "data",
                                 reuse_cache: bool = False):
    """Sharded unsup / plus_unsup cached-epoch program (reference dispatch
    src/utils.py:159-181): each device encodes its own EXTENDED batch
    (pair-endpoint union, src/models.py:135-148), computes the pair loss
    (+ NLL over the extended rows for plus_unsup), and the losses pmean
    over the mesh inside the differentiated function.

    epoch(params, feats, neighbors, degrees, batches [T, n_dev, U],
    labels [T, n_dev, U], row_masks [T, n_dev, U],
    pair_stack {field: [T, n_dev, ...]}, key) -> (params, losses [T]).
    Build the stacks with build_unsup_epoch_stack.

    ``reuse_cache=True``: takes (cache [N, D], cnt [N]) row-sharded after
    ``degrees`` instead of refreshing (see make_cached_dist_epoch).
    """
    n_dev = mesh.shape[axis]
    is_max = mcfg.agg_func == "MAX"
    # LSTM = cached-LSTM hybrid (train/cached.py docstring): MEAN leaf
    # cache (is_max False), live LSTM cells in _upper_layers.
    assert mcfg.agg_func in ("MEAN", "MAX", "LSTM"), mcfg.agg_func

    def local_epoch(params, feats, neighbors, degrees, *rest):
        if reuse_cache:
            (cache_local, cnt_local, batches, labels, row_masks,
             pair_stack, key) = rest
            rows_per = feats.shape[0] // n_dev
            idx = jax.lax.axis_index(axis)
            x_local = jax.lax.dynamic_slice_in_dim(
                feats, idx * rows_per, rows_per, axis=0)
            k_steps = key
        else:
            batches, labels, row_masks, pair_stack, key = rest
            idx = jax.lax.axis_index(axis)
            k_cache, k_steps = jax.random.split(key)
            x_local, cache_local, cnt_local = _local_refresh(
                k_cache, feats, neighbors, degrees, fanout, is_max, idx,
                n_dev)
        batches = batches[:, 0]                    # [T, U] local shard
        labels, row_masks = labels[:, 0], row_masks[:, 0]
        pair_stack = {k: v[:, 0] for k, v in pair_stack.items()}

        def step(p, batch, lab, rmask, pairs, k_dev):
            def loss_fn(pp):
                pp = cast_compute(pp, mcfg)
                h = _sharded_forward(pp, mcfg, x_local, cache_local,
                                     cnt_local, neighbors, degrees, batch,
                                     k_dev, fanout, axis, is_max)
                loss = unsup_loss_from_pairbatch(h, pairs, unsup_loss,
                                                 q=q, margin=margin)
                if learn_method == "plus_unsup":
                    logp = classifier_apply(pp["clf"], h)
                    loss = loss + supervised_nll(logp, lab, rmask)
                return jax.lax.pmean(loss, axis)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = {k: clip_by_global_norm(g, clip)
                     for k, g in grads.items()}
            return sgd_update(p, grads, lr), loss

        def body(carry, xs):
            p, k = carry
            batch, lab, rmask, pairs = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, batch, lab, rmask, pairs,
                           jax.random.fold_in(sub, idx))
            return (p, k), loss

        (params, _), losses = jax.lax.scan(
            body, (params, k_steps), (batches, labels, row_masks,
                                      pair_stack))
        return params, losses

    stack_specs = (P(None, axis, None), P(None, axis, None),
                   P(None, axis, None), P(None, axis), P())
    cache_specs = (P(axis, None), P(axis)) if reuse_cache else ()
    sharded = shard_map(
        local_epoch, mesh=mesh,
        in_specs=(P(), P(), P(), P()) + cache_specs + stack_specs,
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def place_epoch_inputs(mesh: Mesh, feats, neighbors, degrees, batches,
                       labels, row_masks, axis: str = "data"):
    """Device-put the epoch tensors with their shardings (tables
    replicated, batch stacks sharded over the [n_dev] dim)."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(None, axis, None))
    return (jax.device_put(jnp.asarray(feats), repl),
            jax.device_put(jnp.asarray(neighbors), repl),
            jax.device_put(jnp.asarray(degrees), repl),
            jax.device_put(jnp.asarray(batches), shard),
            jax.device_put(jnp.asarray(labels), shard),
            jax.device_put(jnp.asarray(row_masks), shard))
