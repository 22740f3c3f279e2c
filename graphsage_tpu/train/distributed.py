"""Distributed training: edge-partitioned features, halo exchange, DP grads.

The BASELINE config-5 workload (synthetic 10M-edge power-law graph over
N ≥ 2 hosts) is feature-dominated: the [N, D] feature table is the object
that must be partitioned, while int32 adjacency is ~D/P times smaller and
stays replicated.  Design (SURVEY §2b graph-partitioner row):

- nodes are partitioned into contiguous ranges over the mesh ``data`` axis;
  the feature table is sharded row-wise (parallel/halo.py);
- each device trains on its own batch shard; neighbor sampling runs on host
  through the native C++ engine (fast, prefetchable) producing the same
  dense per-occurrence frontier layout as sampler/device.py;
- layer-0 feature rows are fetched with the two-phase all_to_all halo
  exchange; everything after the gather is device-local;
- gradients are `pmean`'d over the data axis inside the same shard_map —
  XLA compiles the collectives onto ICI.

The whole device step (halo + encode + loss + grad + psum + clip + SGD) is
one jit'd SPMD program; the host contributes only index tables.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graphsage_tpu.data.graph import CSRGraph
from graphsage_tpu.losses import supervised_nll
from graphsage_tpu.models import GraphSageConfig, classifier_apply
from graphsage_tpu.models.graphsage import Frontier, graphsage_apply
from graphsage_tpu.parallel.halo import halo_gather_local, plan_halo
from graphsage_tpu.train.dense import cast_compute
from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update


# --------------------------------------------------------------------- host
def sample_dense_host(graph: CSRGraph, batch: np.ndarray, num_layers: int,
                      fanout: int, seed: int, gcn: bool = False):
    """Host-side dense per-occurrence frontier expansion (same layout as
    sampler/device.py) using the native C++ fanout sampler with numpy
    fallback.  batch: [M0] node ids.  Returns (x0_ids [M0·(K+1)^L],
    frontiers bottom-up list of numpy Frontier)."""
    try:
        from graphsage_tpu.native import sample_fanout_native
    except Exception:
        sample_fanout_native = None
    k = fanout
    level_nodes = [np.asarray(batch, dtype=np.int32)]
    level_valid = []
    rng = np.random.RandomState(seed & 0x7fffffff)
    for depth in range(num_layers):
        nodes = level_nodes[-1]
        res = (sample_fanout_native(graph.indptr, graph.indices,
                                    graph.num_nodes, nodes, k,
                                    seed + depth * 1000003)
               if sample_fanout_native else None)
        if res is not None:
            samples, counts = res
        else:
            samples = np.zeros((len(nodes), k), np.int32)
            counts = np.zeros(len(nodes), np.int32)
            for i, v in enumerate(nodes):
                neigh = graph.neighbors(int(v))
                c = min(len(neigh), k)
                counts[i] = c
                if len(neigh) <= k:
                    samples[i, :c] = neigh
                else:
                    samples[i, :c] = rng.choice(neigh, k, replace=False)
        valid = (np.arange(k)[None, :] < counts[:, None])
        valid &= samples != nodes[:, None]
        children = np.concatenate([nodes[:, None], samples], axis=1)
        level_valid.append(valid.astype(np.float32))
        level_nodes.append(children.reshape(-1))

    x0_ids = level_nodes[-1]
    frontiers = []
    for depth in range(num_layers - 1, -1, -1):
        m = len(level_nodes[depth])
        base = (np.arange(m, dtype=np.int32) * (k + 1))
        neigh_idx = base[:, None] + 1 + np.arange(k, dtype=np.int32)[None]
        idx = np.concatenate([base[:, None], neigh_idx], axis=1)
        mask = np.concatenate(
            [np.full((m, 1), 1.0 if gcn else 0.0, np.float32),
             level_valid[depth]], axis=1)
        frontiers.append(Frontier(idx=idx, mask=mask, self_idx=base))
    return x0_ids, frontiers


@dataclasses.dataclass(frozen=True)
class DistBatch:
    """Device-ready tensors for one distributed step (leading dim =
    mesh data axis)."""
    requests: np.ndarray      # [n_dev, n_dev, cap]
    addr_owner: np.ndarray    # [n_dev, u0_loc]
    addr_slot: np.ndarray     # [n_dev, u0_loc]
    addr_is_local: np.ndarray # [n_dev, u0_loc]
    addr_local: np.ndarray    # [n_dev, u0_loc]
    frontiers: list           # numpy Frontiers stacked [n_dev, ...]
    labels: np.ndarray        # [n_dev, b_loc]
    row_mask: np.ndarray      # float32 [n_dev, b_loc]; 0 for padded rows
    # global layer-0 node ids per device (host-side only — not shipped to
    # the device; lets tests/dryruns replay a shard's forward without the
    # halo exchange and assert loss parity)
    x0_ids: np.ndarray | None = None


def build_dist_batch(graph: CSRGraph, labels: np.ndarray,
                     batch_per_dev: np.ndarray, num_layers: int, fanout: int,
                     seed: int, gcn: bool = False,
                     cap: int | None = None,
                     valid: np.ndarray | None = None) -> DistBatch:
    """batch_per_dev: [n_dev, b_loc] node ids.  ``valid`` (same shape, bool)
    marks real rows; padded tail repeats get loss weight 0 (the single-device
    Trainer's row_mask semantics — without it, np.resize repeats in the last
    step of an epoch would get multiplied loss/gradient weight)."""
    n_dev, b_loc = batch_per_dev.shape
    x0_list, frontier_list = [], None
    for d in range(n_dev):
        x0_ids, frontiers = sample_dense_host(
            graph, batch_per_dev[d], num_layers, fanout,
            seed + d * 7919, gcn)
        x0_list.append(x0_ids)
        if frontier_list is None:
            frontier_list = [[] for _ in frontiers]
        for i, f in enumerate(frontiers):
            frontier_list[i].append(f)

    x0_per_dev = np.stack(x0_list)                       # [n_dev, u0_loc]
    plan = plan_halo(x0_per_dev, graph.num_nodes, n_dev, cap=cap)
    stacked = [Frontier(idx=np.stack([f.idx for f in fl]),
                        mask=np.stack([f.mask for f in fl]),
                        self_idx=np.stack([f.self_idx for f in fl]))
               for fl in frontier_list]
    row_mask = (np.ones(batch_per_dev.shape, np.float32) if valid is None
                else np.asarray(valid, np.float32))
    return DistBatch(requests=plan.requests, addr_owner=plan.addr_owner,
                     addr_slot=plan.addr_slot,
                     addr_is_local=plan.addr_is_local,
                     addr_local=plan.addr_local, frontiers=stacked,
                     labels=labels[batch_per_dev].astype(np.int32),
                     row_mask=row_mask, x0_ids=x0_per_dev)


# ------------------------------------------------------------------- device
def _encode_local(p, mcfg: GraphSageConfig, use_pre: bool, axis: str,
                  feats_local, requests, addr_owner, addr_slot,
                  addr_is_local, addr_local, frontiers):
    """Per-shard encode: halo-gather layer-0 features (optionally
    pre-transformed by W1 so the collective moves [·, 2H] instead of
    [·, D]) then the bottom-up layers.  Shared by the sup and unsup
    distributed steps."""
    if not use_pre:
        x0 = halo_gather_local(feats_local, requests, addr_owner,
                               addr_slot, addr_is_local, addr_local, axis)
        return graphsage_apply(p["sage"], mcfg, x0, frontiers)
    w = p["sage"]["layers"][0]["weight"]          # [H, 2D]
    from graphsage_tpu.models.layers import mean_pretransform
    h_local = mean_pretransform(w, feats_local)   # [rows, 2H]
    x0t = halo_gather_local(h_local, requests, addr_owner, addr_slot,
                            addr_is_local, addr_local, axis)   # [u0, 2H]
    hdim = w.shape[0]
    f0 = frontiers[0]
    from graphsage_tpu.ops.aggregate import mean_aggregate
    agg = mean_aggregate(x0t[:, hdim:], f0.idx, f0.mask)
    h = jax.nn.relu(agg + jnp.take(x0t[:, :hdim], f0.self_idx, axis=0))
    for layer in range(1, mcfg.num_layers):
        fl = frontiers[layer]
        agg = mean_aggregate(h, fl.idx, fl.mask)
        from graphsage_tpu.models.layers import sage_layer_apply
        h = sage_layer_apply(p["sage"]["layers"][layer],
                             jnp.take(h, fl.self_idx, axis=0),
                             agg, gcn=False)
    return h


def make_dist_sup_step(mcfg: GraphSageConfig, mesh: Mesh, lr: float = 0.7,
                       clip: float = 5.0, axis: str = "data",
                       pretransform: str = "auto"):
    """Returns jit'd step(params, feats_sharded, dist_batch_tensors)
    -> (params, loss).  params replicated; feats P(data, None).

    pretransform ("auto"/"always" for MEAN non-gcn): each shard transforms
    its LOCAL feature rows by the layer-1 weight before the halo, so the
    collective payload is [·, 2H] instead of [·, D] (D/2H-fold traffic cut
    at wide features) and layer 1 becomes a pure masked mean + relu.
    Exact by linearity of the mean (same algebra as
    models.graphsage._mean_pretransform_layer); gradients flow back to W
    through the all_to_all transpose.
    """
    use_pre = (mcfg.agg_func == "MEAN" and not mcfg.gcn
               and pretransform in ("auto", "always"))

    def local_step(params, feats_local, requests, addr_owner, addr_slot,
                   addr_is_local, addr_local, f_idx, f_mask, f_self,
                   labels, row_mask):
        # leading mesh dim of size 1 on each shard — drop it
        requests, addr_owner, addr_slot = (requests[0], addr_owner[0],
                                           addr_slot[0])
        addr_is_local, addr_local = addr_is_local[0], addr_local[0]
        labels, row_mask = labels[0], row_mask[0]
        frontiers = [Frontier(idx=i[0], mask=m[0], self_idx=s[0])
                     for i, m, s in zip(f_idx, f_mask, f_self)]

        def loss_fn(p):
            # mixed precision: cast INSIDE the differentiated fn (same
            # seam as the dense/cached pipelines) so master weights and
            # gradients stay f32 while compute runs in mcfg.compute_dtype
            p = cast_compute(p, mcfg)
            embs = _encode_local(p, mcfg, use_pre, axis,
                                 cast_compute(feats_local, mcfg),
                                 requests, addr_owner, addr_slot,
                                 addr_is_local, addr_local, frontiers)
            logp = classifier_apply(p["clf"], embs)
            mask = row_mask.astype(embs.dtype)
            # the pmean lives INSIDE the differentiated function so autodiff
            # inserts the correct gradient collective.  (Differentiating a
            # per-shard loss w.r.t. replicated params and pmean-ing the
            # grads afterwards silently psums instead under jax's unreduced
            # vma semantics — 8x-scaled gradients; caught by
            # tests/test_distributed.py::test_distributed_update_matches_
            # single_device.)
            return jax.lax.pmean(supervised_nll(logp, labels, mask), axis)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
        return sgd_update(params, grads, lr), loss

    n_layers = mcfg.num_layers
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None)] * n_layers),
                  P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(params, feats_sharded, requests, addr_owner, addr_slot,
             addr_is_local, addr_local, f_idx, f_mask, f_self, labels,
             row_mask):
        new_params, loss = sharded(params, feats_sharded, requests,
                                   addr_owner, addr_slot, addr_is_local,
                                   addr_local, f_idx, f_mask, f_self,
                                   labels, row_mask)
        return new_params, loss

    return step


def build_dist_unsup_batch(graph: CSRGraph, labels: np.ndarray,
                           pair_sampler, batch_per_dev: np.ndarray,
                           num_layers: int, fanout: int, num_neg: int,
                           seed: int, gcn: bool = False,
                           cap: int | None = None,
                           target_valid: np.ndarray | None = None):
    """Unsup/plus_unsup distributed batch: per device, extend the batch
    with walk-positive / BFS-negative pair endpoints (reference
    src/models.py:135-148 — done for every learn method), then build the
    halo plan over the per-device EXTENDED batches.

    Returns (DistBatch, pairs) where pairs is a dict of [n_dev, ...] numpy
    tensors (the PairBatch layout; rows index each device's extended
    batch).  Devices' extended batches are re-padded to one common width
    so they stack; row_mask marks real rows.

    ``target_valid`` ([n_dev, b_loc] bool) marks which target positions
    are real: tail steps wrap-padded with repeats pass it so repeated
    targets' pair terms are zeroed (node_valid).  NB the plus_unsup NLL
    dedups repeats within a device (unique_nodes), but a node whose
    wrap-repeat lands on a DIFFERENT device still contributes one NLL row
    per device on that single tail step — same weighting the reference's
    extended batches give nodes shared between pair endpoints.
    """
    n_dev, _ = batch_per_dev.shape
    rng = np.random.RandomState(seed & 0x7fffffff)
    pbs = [pair_sampler.sample_batch(batch_per_dev[d], num_neg, rng)
           for d in range(n_dev)]
    u_pad = max(len(pb.unique_nodes) for pb in pbs)
    ext = np.zeros((n_dev, u_pad), np.int64)
    valid = np.zeros((n_dev, u_pad), bool)
    for d, pb in enumerate(pbs):
        ext[d, :len(pb.unique_nodes)] = pb.unique_nodes
        valid[d, :pb.num_unique] = True
    db = build_dist_batch(graph, labels, ext, num_layers, fanout,
                          seed=seed + 7919, gcn=gcn, cap=cap, valid=valid)
    pairs = {
        k: np.stack([np.asarray(getattr(pb, k)) for pb in pbs])
        for k in ("target_rows", "pos_q", "pos_mask",
                  "neg_q", "neg_mask", "node_valid")
    }
    if target_valid is not None:
        # tail steps padded with np.resize repeats: zero the repeated
        # targets' node_valid so each real node's pair loss counts once
        # (the sup path's `valid` row mask, applied to the pair objective)
        pairs["node_valid"] = (
            pairs["node_valid"] * target_valid.astype(np.float32))
    return db, pairs


def make_dist_unsup_step(mcfg: GraphSageConfig, mesh: Mesh,
                         unsup_loss: str = "normal",
                         learn_method: str = "unsup", lr: float = 0.7,
                         clip: float = 5.0, q: float = 10.0,
                         margin: float = 3.0, axis: str = "data",
                         pretransform: str = "auto"):
    """Distributed unsup / plus_unsup step (reference dispatch
    src/utils.py:159-181 over the halo-partitioned forward): per-shard
    pair loss (+ supervised NLL over the extended batch for plus_unsup),
    pmean'd inside the differentiated function, clip, SGD.

    step(params, feats_sharded, *dist_args, *pair_args) where dist_args =
    dist_batch_to_device(db, mesh) and pair_args =
    pairs_to_device(pairs, mesh)."""
    from graphsage_tpu.losses import unsup_loss_from_pairbatch

    use_pre = (mcfg.agg_func == "MEAN" and not mcfg.gcn
               and pretransform in ("auto", "always"))

    def local_step(params, feats_local, requests, addr_owner, addr_slot,
                   addr_is_local, addr_local, f_idx, f_mask, f_self,
                   labels, row_mask, target_rows, pos_q, pos_mask,
                   neg_q, neg_mask, node_valid):
        requests, addr_owner, addr_slot = (requests[0], addr_owner[0],
                                           addr_slot[0])
        addr_is_local, addr_local = addr_is_local[0], addr_local[0]
        labels, row_mask = labels[0], row_mask[0]
        frontiers = [Frontier(idx=i[0], mask=m[0], self_idx=s[0])
                     for i, m, s in zip(f_idx, f_mask, f_self)]
        pairs = {"target_rows": target_rows[0],
                 "pos_q": pos_q[0], "pos_mask": pos_mask[0],
                 "neg_q": neg_q[0],
                 "neg_mask": neg_mask[0], "node_valid": node_valid[0]}

        def loss_fn(p):
            # mixed precision: cast INSIDE the differentiated fn (same
            # seam as the dense/cached pipelines) so master weights and
            # gradients stay f32 while compute runs in mcfg.compute_dtype
            p = cast_compute(p, mcfg)
            embs = _encode_local(p, mcfg, use_pre, axis,
                                 cast_compute(feats_local, mcfg),
                                 requests, addr_owner, addr_slot,
                                 addr_is_local, addr_local, frontiers)
            loss = unsup_loss_from_pairbatch(embs, pairs, unsup_loss,
                                             q=q, margin=margin)
            if learn_method == "plus_unsup":
                logp = classifier_apply(p["clf"], embs)
                loss = loss + supervised_nll(logp, labels, row_mask)
            # pmean INSIDE the differentiated function (see the sup step's
            # note on jax's unreduced-vma gradient semantics)
            return jax.lax.pmean(loss, axis)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: clip_by_global_norm(g, clip) for k, g in grads.items()}
        return sgd_update(params, grads, lr), loss

    n_layers = mcfg.num_layers
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None)] * n_layers),
                  P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None), P(axis, None)),
        out_specs=(P(), P()),
    )

    return jax.jit(sharded)


def pairs_to_device(pairs: dict, mesh: Mesh, axis: str = "data"):
    """Place the stacked pair tensors; returns the positional tail args for
    make_dist_unsup_step's step fn (order matches its signature)."""
    from graphsage_tpu.parallel.multihost import put_global
    order = ("target_rows", "pos_q", "pos_mask",
             "neg_q", "neg_mask", "node_valid")
    specs = {"target_rows": P(axis, None), "node_valid": P(axis, None)}
    return tuple(put_global(pairs[k], mesh,
                            specs.get(k, P(axis, None, None)))
                 for k in order)


def dist_batch_to_device(db: DistBatch, mesh: Mesh, axis: str = "data"):
    """Place DistBatch tensors with their shardings; returns the tuple of
    jnp args for the step function (after params, feats).  Uses the
    multi-controller-safe construction so the same code path serves both a
    single process and a jax.distributed multi-process job (each process
    feeds only its addressable shards)."""
    from graphsage_tpu.parallel.multihost import put_global
    put = lambda a, spec: put_global(a, mesh, spec)
    f_idx = tuple(put(f.idx, P(axis, None, None)) for f in db.frontiers)
    f_mask = tuple(put(f.mask, P(axis, None, None)) for f in db.frontiers)
    f_self = tuple(put(f.self_idx, P(axis, None)) for f in db.frontiers)
    return (put(db.requests, P(axis, None, None)),
            put(db.addr_owner, P(axis, None)),
            put(db.addr_slot, P(axis, None)),
            put(db.addr_is_local, P(axis, None)),
            put(db.addr_local, P(axis, None)),
            f_idx, f_mask, f_self,
            put(db.labels, P(axis, None)),
            put(db.row_mask, P(axis, None)))
