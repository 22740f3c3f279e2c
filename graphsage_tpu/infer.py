"""Deterministic full-graph inference and serving export.

The reference's only inference surface is ``get_gnn_embeddings``
(src/utils.py:59-78): minibatched forwards with **fresh random fanout-10
sampling**, so even evaluation is nondeterministic (src/utils.py:27 — the
val forward resamples every call).  That protocol lives in
``Trainer.embed_nodes`` / ``Trainer.all_embeddings``.  This module adds the
serving-grade alternative the reference lacks:

- **Exact, deterministic full-neighborhood inference** — propagate every
  node one layer at a time over the full padded adjacency (all true
  neighbors, no sampling).  Two calls give bit-identical embeddings, and
  every node sees its complete neighborhood (the standard layer-wise
  GraphSAGE inference scheme).  On TPU this is the ideal shape of work:
  each layer is one [N, D]·[D, 2H] table GEMM (the MEAN pretransform —
  mean is linear, so aggregate-then-transform == transform-then-aggregate)
  plus blocked H-wide gathers, all under one jit.
- **Export/load bundles** — orbax params + a JSON model config, so a
  trained model can be shipped to a serving process that never imports the
  training stack (no sampler, no optimizer, no pair machinery).

Self-inclusion semantics match the samplers (src/models.py:285,297-298 via
sampler/device.py): the aggregation set is the full neighbor set minus the
node itself unless ``gcn``, in which case it is neighbors ∪ {self} with
self-loop edges masked so self is never double-counted.  MEAN over zero
valid slots yields 0 (documented ops/aggregate.py semantics).  LSTM
aggregation is order-sensitive; deterministic inference runs the cell over
the adjacency-table slot order (training uses random slot orders — the
fixed order is what makes serving reproducible).
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import PaddedAdjacency
from graphsage_tpu.models.graphsage import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import (classifier_apply, init_classifier,
                                         mean_pretransform,
                                         sage_layer_apply)
from graphsage_tpu.models.lstm_agg import lstm_aggregate
from graphsage_tpu.ops.aggregate import max_aggregate, mean_aggregate

# HBM working-set budget for one block's gathered [block, S, gather_dim]
# intermediate (lax.map bounds the peak to one block at a time).  This is
# NOT a VMEM bound — VMEM is ~16 MB and XLA tiles within the block; the
# budget just keeps the intermediate small next to the node tables.
_GATHER_BYTES_BUDGET = 256 << 20


def _pick_block(n: int, width: int, gather_dim: int, itemsize: int,
                requested: int | None) -> int:
    """``gather_dim`` is the width of the rows actually gathered: out_size
    for MEAN (the pretransform gathers H-wide activations, never raw
    features), the raw feature dim for MAX/LSTM layer 1."""
    if requested is not None:
        return max(1, min(requested, n))
    per_row = max(1, width * gather_dim * itemsize)
    block = _GATHER_BYTES_BUDGET // per_row
    # no lower clamp beyond 1: a wide uncapped adjacency (power-law hubs
    # give per_row in the tens of MB) must be allowed tiny blocks, or the
    # [block, S, D] temp silently exceeds the budget by orders of magnitude
    return int(np.clip(block, 1, max(1, n)))


def _layer_full(cfg: GraphSageConfig, params: dict, layer: int,
                h: jax.Array, idx: jax.Array, mask: jax.Array,
                blocks: int, block: int,
                agg_func: str | None = None) -> jax.Array:
    """One full-table layer: h [N, Din] -> [N, H] (padded to blocks·block).

    idx/mask: [blocks·block, S] aggregation slots (self slot appended by the
    caller in gcn mode).  The gather/aggregate stage runs under lax.map in
    ``blocks`` chunks to bound the [block, S, *] intermediates.
    """
    agg_func = agg_func or cfg.agg_func
    w = params["layers"][layer]["weight"]
    hdim = w.shape[0]
    n = h.shape[0]
    idx_b = idx.reshape(blocks, block, -1)
    mask_b = mask.reshape(blocks, block, -1)
    row_b = jnp.arange(blocks * block, dtype=jnp.int32).reshape(blocks, block)
    row_b = jnp.minimum(row_b, n - 1)  # padded tail rows: computed, dropped

    if agg_func == "MEAN":
        # mean is linear: transform the TABLE once ([N, Din]·[Din, 2H] for
        # non-gcn), then gather/average H-wide rows — identical math to
        # aggregate-then-transform up to matmul reassociation, with D/H x
        # less gather traffic (models/graphsage.py pretransform rationale).
        if cfg.gcn:
            z = mean_pretransform(w, h, gcn=True)               # [N, H]

            def blk(args):
                i, m, r = args
                return jax.nn.relu(mean_aggregate(z, i, m)
                                   ).astype(h.dtype)
        else:
            z = mean_pretransform(w, h)                         # [N, 2H]

            def blk(args):
                i, m, r = args
                agg = mean_aggregate(z[:, hdim:], i, m)
                return jax.nn.relu(agg + jnp.take(z[:, :hdim], r, axis=0)
                                   ).astype(h.dtype)

        out = jax.lax.map(blk, (idx_b, mask_b, row_b))
        return out.reshape(blocks * block, hdim)

    if agg_func in ("MAX", "LSTM"):
        def blk(args):
            i, m, r = args
            if agg_func == "MAX":
                agg = max_aggregate(h, i, m)
            else:
                agg = lstm_aggregate(params["agg"][layer], h, i, m)
            self_rows = (agg if cfg.gcn else jnp.take(h, r, axis=0))
            return sage_layer_apply(params["layers"][layer],
                                    self_rows, agg, gcn=cfg.gcn)

        out = jax.lax.map(blk, (idx_b, mask_b, row_b))
        return out.reshape(blocks * block, hdim)

    raise ValueError(f"unknown agg_func {agg_func!r}")


@partial(jax.jit,
         static_argnames=("cfg", "blocks", "block", "lstm_hybrid"))
def _full_embed(params: dict, cfg: GraphSageConfig, feats: jax.Array,
                neighbors: jax.Array, degrees: jax.Array,
                blocks: int, block: int,
                lstm_hybrid: bool = False) -> jax.Array:
    """All-layer full-neighborhood propagation: [N, D] -> [N, out_size]."""
    n, p = neighbors.shape
    npad = blocks * block
    own = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = slot < degrees[:, None]
    # self never aggregates with itself: reference removes self from the
    # set unless gcn (src/models.py:297-298), and in gcn mode self enters
    # once via the dedicated slot below — mask self-loop edges either way.
    valid &= neighbors != own[:, None]
    mask = valid.astype(feats.dtype)
    idx = neighbors.astype(jnp.int32)
    if cfg.gcn:
        idx = jnp.concatenate([own[:, None], idx], axis=1)
        mask = jnp.concatenate([jnp.ones((n, 1), mask.dtype), mask], axis=1)
    pad_rows = npad - n
    if pad_rows:
        idx = jnp.pad(idx, ((0, pad_rows), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_rows), (0, 0)))

    h = feats.astype(jnp.dtype(cfg.compute_dtype))
    for layer in range(cfg.num_layers):
        with jax.named_scope(f"infer_layer_{layer + 1}"):
            # cached-LSTM hybrid (train/cached.py): layer 1 aggregates
            # with MEAN (its LSTM cell is never trained), layers 2..L run
            # the live cells — serving must match the trained topology
            agg = ("MEAN" if lstm_hybrid and layer == 0 else None)
            # _layer_full returns blocks·block rows; only the first n are
            # real nodes (idx values always index < n)
            h = _layer_full(cfg, params, layer, h, idx, mask,
                            blocks, block, agg_func=agg)[:n]
    return h


def full_graph_embeddings(params: dict, cfg: GraphSageConfig,
                          feats, pad: PaddedAdjacency,
                          block: int | None = None,
                          fetch: bool = True,
                          lstm_hybrid: bool = False):
    """Exact deterministic embeddings for every node: [N, out_size] f32.

    ``pad`` should be the full (uncapped) adjacency for exact semantics; a
    width-capped table computes the same propagation over the capped
    neighbor sets (documented truncation, still deterministic).

    For repeated calls (serving loops), pass device-resident arrays —
    ``feats`` as a jax array and a ``PaddedAdjacency`` whose
    neighbors/degrees were ``jax.device_put``; with numpy inputs every
    call re-uploads the tables (InferenceSession pins them once).
    ``fetch=False`` returns the on-device [N, out_size] array instead of
    pulling it to host f32 (benchmarks, device-side consumers).
    ``lstm_hybrid=True`` serves a cached-LSTM-hybrid model (train/cached.py
    ``--lstm_hybrid``): MEAN aggregation at layer 1, live LSTM cells above
    — the layer-0 LSTM cell of such a model is never trained and must not
    be used.
    """
    n = pad.num_nodes
    feats = jnp.asarray(feats)
    gather_dim = (cfg.out_size if cfg.agg_func == "MEAN"
                  else max(int(feats.shape[1]), cfg.out_size))
    block = _pick_block(n, pad.width, gather_dim,
                        jnp.dtype(cfg.compute_dtype).itemsize, block)
    blocks = -(-n // block)
    out = _full_embed(params, cfg, feats, jnp.asarray(pad.neighbors),
                      jnp.asarray(pad.degrees), blocks, block,
                      lstm_hybrid=lstm_hybrid)
    if not fetch:
        return out
    return np.asarray(out, dtype=np.float32)


def full_graph_embeddings_sharded(params: dict, cfg: GraphSageConfig,
                                  feats, pad: PaddedAdjacency,
                                  mesh=None, axis: str = "data",
                                  lstm_hybrid: bool = False) -> np.ndarray:
    """Multi-device deterministic inference: node rows sharded over a mesh.

    Per layer the per-device program is transform-locally-then-all_gather:
    each device applies the layer weight to its OWN rows (for MEAN via the
    pretransform, so the collective moves H-wide activations — 2·H floats
    per node instead of D features), `all_gather`s the [N, ·] table over
    ICI, and aggregates its own rows' neighborhoods locally.  MAX/LSTM are
    nonlinear in the neighbors, so they gather the raw [N, Din] table
    instead.  Math is identical to :func:`full_graph_embeddings` up to
    reassociation; parity is tested on the virtual 8-device CPU mesh
    (tests/test_infer.py).

    ``lstm_hybrid`` mirrors :func:`full_graph_embeddings`: a cached-LSTM
    hybrid model's layer-1 LSTM cell is never trained, so layer 1 must run
    the MEAN path (serving the trained topology).
    """
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, (axis,))
    n_dev = mesh.shape[axis]
    n, p = pad.neighbors.shape
    npad = -(-n // n_dev) * n_dev

    # global aggregation slots, built exactly as in _full_embed
    own = np.arange(n, dtype=np.int32)
    valid = (np.arange(p)[None, :] < pad.degrees[:, None])
    valid &= pad.neighbors != own[:, None]
    mask = valid.astype(np.dtype(cfg.compute_dtype))
    idx = pad.neighbors.astype(np.int32)
    if cfg.gcn:
        idx = np.concatenate([own[:, None], idx], axis=1)
        mask = np.concatenate([np.ones((n, 1), mask.dtype), mask], axis=1)
    idx = np.pad(idx, ((0, npad - n), (0, 0)))
    mask = np.pad(mask, ((0, npad - n), (0, 0)))
    h0 = np.zeros((npad, feats.shape[1]), dtype=np.dtype(cfg.compute_dtype))
    h0[:n] = np.asarray(feats)

    row_shard = NamedSharding(mesh, P(axis))
    h0, idx, mask = (jax.device_put(h0, row_shard),
                     jax.device_put(idx, row_shard),
                     jax.device_put(mask, row_shard))

    def device_program(params, h_loc, idx_loc, mask_loc):
        for layer in range(cfg.num_layers):
            agg_func = ("MEAN" if lstm_hybrid and layer == 0
                        else cfg.agg_func)
            w = params["layers"][layer]["weight"]
            hdim = w.shape[0]
            if agg_func == "MEAN":
                if cfg.gcn:
                    z_loc = mean_pretransform(w, h_loc, gcn=True)
                    z = jax.lax.all_gather(z_loc, axis, axis=0, tiled=True)
                    h_loc = jax.nn.relu(
                        mean_aggregate(z, idx_loc, mask_loc)
                    ).astype(z.dtype)
                else:
                    z_loc = mean_pretransform(w, h_loc)
                    z = jax.lax.all_gather(z_loc, axis, axis=0, tiled=True)
                    agg = mean_aggregate(z[:, hdim:], idx_loc, mask_loc)
                    h_loc = jax.nn.relu(agg + z_loc[:, :hdim]
                                        ).astype(z.dtype)
            else:
                h_full = jax.lax.all_gather(h_loc, axis, axis=0, tiled=True)
                if agg_func == "MAX":
                    agg = max_aggregate(h_full, idx_loc, mask_loc)
                else:
                    agg = lstm_aggregate(params["agg"][layer], h_full,
                                         idx_loc, mask_loc)
                h_loc = sage_layer_apply(params["layers"][layer], h_loc,
                                         agg, gcn=cfg.gcn)
        return h_loc

    fn = jax.jit(shard_map(
        device_program, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)), out_specs=P(axis)))
    out = fn(params, h0, idx, mask)
    return np.asarray(out, dtype=np.float32)[:n]


# --------------------------------------------------------------- serving

_BUNDLE_META = "bundle.json"
_BUNDLE_PARAMS = "params"


def export_bundle(path: str, params: dict, mcfg: GraphSageConfig,
                  num_classes: int, meta: dict | None = None) -> None:
    """Write a self-contained serving bundle: orbax params + JSON config.

    ``params`` is the trainer pytree {"sage": ..., "clf": ...}.  The bundle
    is everything a serving process needs besides the graph itself (exceeds
    the reference's whole-module torch.save, src/utils.py:52, which can
    only be loaded back into the training code).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    record = {
        "model": dataclasses.asdict(mcfg),
        "num_classes": int(num_classes),
        "format_version": 1,
    }
    if meta:
        record["meta"] = meta
    with open(os.path.join(path, _BUNDLE_META), "w") as f:
        json.dump(record, f, indent=1)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, _BUNDLE_PARAMS),
               jax.device_get(params), force=True)
    ckptr.wait_until_finished()


def load_bundle(path: str) -> tuple[dict, GraphSageConfig, int, dict]:
    """Restore (params, mcfg, num_classes, meta) from an exported bundle."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _BUNDLE_META)) as f:
        record = json.load(f)
    version = record.get("format_version")
    if version != 1:
        raise ValueError(
            f"bundle at {path} has format_version={version!r}; this "
            f"build reads version 1 — re-export the bundle or upgrade")
    mcfg = GraphSageConfig(**record["model"])
    num_classes = int(record["num_classes"])
    # abstract target rebuilt host-side from the config (shape/dtype only)
    k = jax.random.PRNGKey(0)
    abstract = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype),
        jax.device_get({"sage": init_graphsage(k, mcfg),
                        "clf": init_classifier(k, mcfg.out_size,
                                               num_classes)}))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, _BUNDLE_PARAMS),
                           target=abstract)
    params = jax.tree_util.tree_map(np.asarray, params)
    return params, mcfg, num_classes, record.get("meta", {})


class InferenceSession:
    """Serving-side handle: deterministic embeddings + class predictions.

    Wraps a trained (or bundle-loaded) model with a graph: computes the
    full-graph embedding table once (lazily) and serves arbitrary node
    queries from it.  No training imports, no RNG, no host sampling.
    """

    def __init__(self, params: dict, mcfg: GraphSageConfig,
                 feats, pad: PaddedAdjacency,
                 block: int | None = None,
                 lstm_hybrid: bool = False) -> None:
        self.params = params
        self.mcfg = mcfg
        self.lstm_hybrid = lstm_hybrid
        # pin the graph on device once: serving calls must not re-upload
        # the feature/adjacency tables (dominant cost on remote backends)
        self.feats = jax.device_put(jnp.asarray(feats))
        self.pad = PaddedAdjacency(
            neighbors=jax.device_put(jnp.asarray(pad.neighbors)),
            degrees=jax.device_put(jnp.asarray(pad.degrees)),
            true_degrees=pad.true_degrees, truncated=pad.truncated)
        self.block = block
        self._emb: np.ndarray | None = None

    @classmethod
    def from_bundle(cls, path: str, feats, pad: PaddedAdjacency,
                    block: int | None = None) -> "InferenceSession":
        params, mcfg, _ncls, meta = load_bundle(path)
        return cls(params, mcfg, feats, pad, block,
                   lstm_hybrid=bool(meta.get("lstm_hybrid", False)))

    def embeddings(self) -> np.ndarray:
        """[N, out_size] f32 table, computed once and cached."""
        if self._emb is None:
            self._emb = full_graph_embeddings(
                self.params["sage"], self.mcfg, self.feats, self.pad,
                self.block, lstm_hybrid=self.lstm_hybrid)
        return self._emb

    def embed(self, nodes) -> np.ndarray:
        """Rows of the embedding table; a scalar id yields a [1, H] batch
        (predict/log_probs always return batched results)."""
        return self.embeddings()[np.atleast_1d(np.asarray(nodes))]

    def log_probs(self, nodes) -> np.ndarray:
        embs = jnp.asarray(self.embed(nodes))
        return np.asarray(classifier_apply(self.params["clf"], embs),
                          dtype=np.float32)

    def predict(self, nodes) -> np.ndarray:
        """argmax class per node (reference predicts via
        classification(embs).max(1) — src/utils.py:28-33)."""
        return np.argmax(self.log_probs(nodes), axis=1)

    def score_pairs(self, src, dst) -> np.ndarray:
        """Cosine similarity between embedding pairs — the unsup
        objective's score (reference src/models.py:82: the trained
        embeddings' natural link-prediction readout).  src/dst: equal-
        length node-id arrays; returns [len] f32 in [-1, 1]."""
        emb = self.embeddings()
        a = emb[np.atleast_1d(np.asarray(src))]
        b = emb[np.atleast_1d(np.asarray(dst))]
        denom = (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
        return (a * b).sum(axis=1) / np.maximum(denom, 1e-12)


def _main(argv=None) -> int:
    """Serving CLI: load a bundle, embed/predict from the command line.

    python -m graphsage_tpu.infer --bundle bundles/cora --dataSet cora \
        [--nodes 0,1,2] [--eval] [--save_embeddings out.npy]
    """
    import argparse

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--dataSet", default="cora")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--seed", type=int, default=824,
                    help="dataset seed (split / synthetic generation) — "
                         "must match the training run's")
    ap.add_argument("--nodes", default=None,
                    help="comma-separated node ids to predict "
                         "(default: report val/test F1 with --eval, "
                         "else predict nothing)")
    ap.add_argument("--eval", action="store_true",
                    help="report deterministic val/test micro-F1")
    ap.add_argument("--save_embeddings", default=None,
                    help="write the [N, H] f32 table as .npy")
    args = ap.parse_args(argv)

    from graphsage_tpu.data import load_dataset

    kw = {"root": args.data_root} if args.data_root else {}
    ds = load_dataset(args.dataSet, seed=args.seed, **kw)
    sess = InferenceSession.from_bundle(args.bundle, ds.features,
                                        ds.graph.to_padded())
    if args.nodes:
        ids = np.array([int(x) for x in args.nodes.split(",")])
        for i, p in zip(ids, sess.predict(ids)):
            print(f"node {i}: class {p}")
    if args.eval:
        from graphsage_tpu.train.metrics import micro_f1
        for split, nodes in (("val", ds.val_nodes), ("test",
                                                     ds.test_nodes)):
            f1 = micro_f1(ds.labels[nodes], sess.predict(nodes))
            print(f"{split} micro-F1: {f1:.4f}")
    if args.save_embeddings:
        np.save(args.save_embeddings, sess.embeddings())
        print(f"wrote embeddings {sess.embeddings().shape} to "
              f"{args.save_embeddings}")
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
