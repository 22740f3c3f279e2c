"""CachedTrainer: the reference training protocol on the leaf-cached
pipeline (train/cached.py) — the framework's single-chip throughput path,
reachable from the public CLI via ``--pipeline cached``.

Protocol mapping (vs the compact Trainer, which is the per-step parity
path):

- Batches are extended with walk-positive / BFS-negative pair endpoints for
  every learn method (reference src/utils.py:147-149), the loss masks
  padded rows, and evaluation keeps the best-val→test checkpoint protocol
  (src/utils.py:13-57).  Set ``extend_batches=False`` for plain fixed-size
  supervised batches (the configuration benchmarked in BASELINE.md).
- One EPOCH is ONE XLA program: leaf-cache refresh + `lax.scan` over the
  stacked step tensors (train/cached.py epoch drivers).  All host work
  (shuffle, pair sampling, stacking) happens before the single dispatch.
- Sampling semantics: depth-L neighborhoods are one uniform fanout-subset
  per node per EPOCH (vs per-BATCH sharing in the reference,
  src/models.py:277-289); depths < L sample fresh per step on device.
  BASELINE.md records 50-epoch Cora F1 parity for this trade.

The exact (all-layer) LSTM aggregator cannot ride the leaf cache — its
cell parameters sit upstream of the leaf gather, so a per-epoch cache
would stale their gradients.  ``agg_func="LSTM"`` therefore requires the
explicit ``lstm_hybrid=True`` opt-in (CLI ``--lstm_hybrid``), which trains
the documented hybrid variant: MEAN leaf cache at layer 1, live LSTM
cells at layers 2..L (train/cached.py module docstring).  Without the
opt-in, use the compact or dense pipelines for the reference-shaped
all-LSTM model.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.loaders import Dataset
from graphsage_tpu.models import GraphSageConfig
from graphsage_tpu.sampler.compact import _bucket
from graphsage_tpu.train.cached import (
    cached_forward,
    make_cached_sup_epoch,
    make_cached_sup_epoch_reuse,
    make_cached_unsup_epoch,
    make_cached_unsup_epoch_reuse,
    refresh_leaf_cache,
)
from graphsage_tpu.train.trainer import TrainConfig, Trainer


def _stack_pair_batches(pbs, b_sz: int, labels_np: np.ndarray):
    """Pad T PairBatches to common shapes and stack: extended batches
    [T, U], labels [T, U], row masks [T, U], pair tensor dict [T, ...].

    Padded extension rows point at node 0 with row_mask 0; padded pair
    rows carry zero masks and node_valid 0, so every loss term they touch
    vanishes exactly (losses.py mask semantics)."""
    t = len(pbs)
    u_max = _bucket(max(pb.unique_nodes.shape[0] for pb in pbs))
    batches = np.zeros((t, u_max), np.int32)
    labels = np.zeros((t, u_max), np.int32)
    row_masks = np.zeros((t, u_max), np.float32)
    fields = ("pos_q", "pos_mask", "neg_q", "neg_mask",
              "node_valid", "target_rows")
    stacked = {f: [] for f in fields}
    for i, pb in enumerate(pbs):
        u = pb.unique_nodes.shape[0]
        batches[i, :u] = pb.unique_nodes
        labels[i, :pb.num_unique] = labels_np[
            pb.unique_nodes[:pb.num_unique]]
        row_masks[i, :pb.num_unique] = 1.0
        for f in fields:
            arr = np.asarray(getattr(pb, f))
            b = arr.shape[0]
            if b < b_sz:  # tail batch: pad pair rows to the common B
                pad_shape = (b_sz - b,) + arr.shape[1:]
                arr = np.concatenate(
                    [arr, np.zeros(pad_shape, arr.dtype)], axis=0)
            stacked[f].append(arr)
    pair_stack = {f: jnp.asarray(np.stack(v)) for f, v in stacked.items()}
    return (jnp.asarray(batches), jnp.asarray(labels),
            jnp.asarray(row_masks), pair_stack)


class CachedTrainer(Trainer):
    """Trainer protocol over the leaf-cached epoch programs.

    Inherits evaluation, the unsup classifier fit, checkpoint integration
    and ``fit`` from :class:`Trainer`; replaces the per-step compact path
    with one scanned XLA program per epoch.
    """

    def __init__(self, dataset: Dataset, model_cfg: GraphSageConfig,
                 train_cfg: TrainConfig, checkpoint_fn=None,
                 table_cap: int | None = None,
                 extend_batches: bool = True,
                 lstm_hybrid: bool = False):
        if model_cfg.agg_func == "LSTM" and not lstm_hybrid:
            raise ValueError(
                "the exact LSTM aggregator cannot use the leaf cache "
                "(cell parameters upstream of the cached gather); pass "
                "lstm_hybrid=True (--lstm_hybrid) for the MEAN-leaf + "
                "live-LSTM hybrid variant, or use --pipeline compact/"
                "dense for the all-LSTM model")
        super().__init__(dataset, model_cfg, train_cfg, checkpoint_fn)
        self.extend_batches = extend_batches
        rng = np.random.RandomState(train_cfg.seed)
        pad = (dataset.graph.to_padded() if table_cap is None
               else dataset.graph.to_padded_sampled(table_cap, rng))
        self.neighbors = jnp.asarray(pad.neighbors)
        self.degrees = jnp.asarray(pad.degrees)
        self._key = jax.random.PRNGKey(train_cfg.seed + 1)

        mcfg, tcfg = self.mcfg, self.tcfg

        def _refresh(key, feats, neighbors, degrees):
            return refresh_leaf_cache(key, feats, neighbors, degrees,
                                      tcfg.fanout, agg=mcfg.agg_func)

        def _fwd(params, feats, cache_feats, cache_count, neighbors,
                 degrees, batch, key):
            return cached_forward(params, mcfg, feats, cache_feats,
                                  cache_count, neighbors, degrees, batch,
                                  key, fanout=tcfg.fanout)

        self._refresh_fn = jax.jit(_refresh)
        self._fwd_fn = jax.jit(_fwd)
        # refresh_every == 1 (default): refresh + scan fused into ONE XLA
        # program per epoch (round-3 semantics, the benchmarked path).
        # refresh_every k > 1: a separate refresh program runs every k-th
        # epoch and the reuse-epoch program consumes the held cache —
        # staleness amortizes the refresh (train/cached.py reuse drivers).
        self._stale_cache = None  # (cache_feats, cache_count) when k > 1
        if tcfg.refresh_every > 1:
            if tcfg.learn_method == "sup":
                self._epoch_fn = jax.jit(make_cached_sup_epoch_reuse(
                    mcfg, fanout=tcfg.fanout, lr=tcfg.lr,
                    clip=tcfg.clip_norm))
            else:
                self._epoch_fn = jax.jit(make_cached_unsup_epoch_reuse(
                    mcfg, unsup_loss=tcfg.unsup_loss, fanout=tcfg.fanout,
                    lr=tcfg.lr, clip=tcfg.clip_norm,
                    learn_method=tcfg.learn_method,
                    q=self.pair_sampler.q, margin=self.pair_sampler.margin))
        elif tcfg.learn_method == "sup":
            self._epoch_fn = jax.jit(make_cached_sup_epoch(
                mcfg, fanout=tcfg.fanout, lr=tcfg.lr, clip=tcfg.clip_norm))
        else:
            self._epoch_fn = jax.jit(make_cached_unsup_epoch(
                mcfg, unsup_loss=tcfg.unsup_loss, fanout=tcfg.fanout,
                lr=tcfg.lr, clip=tcfg.clip_norm,
                learn_method=tcfg.learn_method,
                q=self.pair_sampler.q, margin=self.pair_sampler.margin))

    def _epoch_cache(self):
        """The leaf cache for this epoch under refresh_every=k: refreshed
        on epochs 0, k, 2k, ... and held (stale) in between."""
        tcfg = self.tcfg
        if (self._stale_cache is None
                or self.epoch % tcfg.refresh_every == 0):
            self._key, k_r = jax.random.split(self._key)
            self._stale_cache = self._refresh_fn(
                k_r, self.feats, self.neighbors, self.degrees)
        return self._stale_cache

    # ----------------------------------------------------------- embedding
    def embed_nodes(self, nodes: np.ndarray, sage_params=None) -> np.ndarray:
        """Encode nodes through the cached forward with a FRESH leaf-cache
        draw (matching the reference's fresh-sampling eval,
        src/utils.py:27)."""
        sage_params = sage_params or self.params["sage"]
        nodes = np.asarray(nodes)
        pad = _bucket(len(nodes))
        padded = np.zeros(pad, np.int32)
        padded[:len(nodes)] = nodes
        self._key, k_r, k_f = jax.random.split(self._key, 3)
        cache_feats, cnt = self._refresh_fn(k_r, self.feats, self.neighbors,
                                            self.degrees)
        embs = self._fwd_fn({"sage": sage_params}, self.feats, cache_feats,
                            cnt, self.neighbors, self.degrees,
                            jnp.asarray(padded), k_f)
        return np.asarray(embs).astype(np.float32)[:len(nodes)]

    def all_embeddings(self) -> np.ndarray:
        """Full-graph inference with ONE fresh leaf-cache draw per call.

        Each node is embedded exactly once, so its sampling marginal is
        identical to the base-class per-batch path — but the whole-graph
        refresh runs once instead of ceil(N/emb_b_sz) times (the refresh
        is O(N·fanout·D); per-batch refreshing repeated it ~40x on
        Pubmed).  Layer-2.. sampling stays fresh per batch."""
        n = self.ds.num_nodes
        b = self.tcfg.emb_b_sz
        self._key, k_r = jax.random.split(self._key)
        cache_feats, cnt = self._refresh_fn(k_r, self.feats,
                                            self.neighbors, self.degrees)
        out = np.zeros((n, self.mcfg.out_size), np.float32)
        for lo in range(0, n, b):
            nodes = np.arange(lo, min(lo + b, n))
            pad = _bucket(len(nodes))
            padded = np.zeros(pad, np.int32)
            padded[:len(nodes)] = nodes
            self._key, k_f = jax.random.split(self._key)
            embs = self._fwd_fn({"sage": self.params["sage"]}, self.feats,
                                cache_feats, cnt, self.neighbors,
                                self.degrees, jnp.asarray(padded), k_f)
            out[nodes] = np.asarray(embs).astype(np.float32)[:len(nodes)]
        return out

    # --------------------------------------------------------------- train
    def train_epoch(self) -> float:
        tcfg = self.tcfg
        order = self.rng.permutation(self.ds.train_nodes)
        b = tcfg.b_sz
        t = math.ceil(len(order) / b)
        self._key, k_ep = jax.random.split(self._key)

        if tcfg.learn_method == "sup" and not self.extend_batches:
            # plain fixed-size batches (the benchmarked fast configuration);
            # the wrap-padded tail rows are masked out of the loss
            padded = np.resize(order, t * b)
            batches = padded.reshape(t, b).astype(np.int32)
            row_masks = np.ones((t, b), np.float32)
            real_tail = len(order) - (t - 1) * b
            row_masks[t - 1, real_tail:] = 0.0
            labels = self.labels_np[batches].astype(np.int32)
            visited = len(np.unique(order))
            if tcfg.refresh_every > 1:
                cache_feats, cache_count = self._epoch_cache()
                self.params, losses = self._epoch_fn(
                    self.params, self.feats, cache_feats, cache_count,
                    self.neighbors, self.degrees, jnp.asarray(batches),
                    jnp.asarray(labels), k_ep, jnp.asarray(row_masks))
            else:
                self.params, losses = self._epoch_fn(
                    self.params, self.feats, self.neighbors, self.degrees,
                    jnp.asarray(batches), jnp.asarray(labels), k_ep,
                    jnp.asarray(row_masks))
        else:
            # extended batches for every learn method (reference
            # src/utils.py:147-149); pair tensors ride the same scan
            pbs = [self.pair_sampler.sample_batch(
                order[i * b:(i + 1) * b], tcfg.num_neg, self.rng)
                for i in range(t)]
            batches, labels, row_masks, pair_stack = _stack_pair_batches(
                pbs, b, self.labels_np)
            visited = len({int(v) for pb in pbs
                           for v in pb.unique_nodes[:pb.num_unique]})
            if tcfg.refresh_every > 1:
                cache_feats, cache_count = self._epoch_cache()
                if tcfg.learn_method == "sup":
                    self.params, losses = self._epoch_fn(
                        self.params, self.feats, cache_feats, cache_count,
                        self.neighbors, self.degrees, batches, labels,
                        k_ep, row_masks)
                else:
                    self.params, losses = self._epoch_fn(
                        self.params, self.feats, cache_feats, cache_count,
                        self.neighbors, self.degrees, batches, labels,
                        pair_stack, row_masks, k_ep)
            elif tcfg.learn_method == "sup":
                self.params, losses = self._epoch_fn(
                    self.params, self.feats, self.neighbors, self.degrees,
                    batches, labels, k_ep, row_masks)
            else:
                self.params, losses = self._epoch_fn(
                    self.params, self.feats, self.neighbors, self.degrees,
                    batches, labels, pair_stack, row_masks, k_ep)

        # the epoch fetch is the cached pipeline's one steady-state sync —
        # deadline-guarded against the observed mid-run RPC wedge
        from graphsage_tpu.utils.obs import fetch_with_deadline
        mean_loss = float(np.mean(fetch_with_deadline(
            losses, label=f"cached epoch {self.epoch} loss fetch",
            convert=np.asarray)))
        self.metrics.log("epoch", epoch=self.epoch, mean_loss=mean_loss,
                         visited_nodes=visited, train_nodes=len(order),
                         pipeline="cached")
        return mean_loss
