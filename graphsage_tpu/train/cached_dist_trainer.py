"""CachedDistTrainer: the reference training protocol on the SHARDED
leaf-cached pipeline (train/cached_dist.py), reachable from the public CLI
via ``--pipeline cached_dist``.

Per epoch, one shard_map XLA program runs over the whole mesh: each device
refreshes its N/P rows of the leaf cache, GEMMs its table shard, trains on
its batch shard, and the layer-1 activation table rides `all_gather`
forward / `psum_scatter` backward (the P-way-split bottleneck scatter —
BASELINE.md "Sharded cached epoch").  Batch extension with pair endpoints
(reference src/utils.py:147-149) applies per DEVICE batch; losses are
per-device means pmean'd over the mesh (standard DP loss semantics; equal
to the global mean when device shards carry equal valid counts).

Evaluation / classifier fit / checkpointing inherit from CachedTrainer:
the node tables are replicated in this design, so any one device embeds
alone — eval math is identical to the single-device cached path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphsage_tpu.data.loaders import Dataset
from graphsage_tpu.models import GraphSageConfig
from graphsage_tpu.train.cached_dist import (
    build_epoch_stack,
    build_unsup_epoch_stack,
    make_cached_dist_epoch,
    make_cached_dist_refresh,
    make_cached_dist_unsup_epoch,
    pad_node_tables,
)
from graphsage_tpu.train.cached_trainer import CachedTrainer
from graphsage_tpu.train.trainer import TrainConfig


class CachedDistTrainer(CachedTrainer):
    """CachedTrainer protocol over the sharded epoch programs.

    ``b_sz`` is the GLOBAL batch (split b_sz // n_dev per device; rounded
    up to a multiple of n_dev).
    """

    def __init__(self, dataset: Dataset, model_cfg: GraphSageConfig,
                 train_cfg: TrainConfig, checkpoint_fn=None,
                 table_cap: int | None = None,
                 extend_batches: bool = True, mesh: Mesh | None = None,
                 lstm_hybrid: bool = False):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        if train_cfg.b_sz % self.n_dev:
            import dataclasses
            train_cfg = dataclasses.replace(
                train_cfg,
                b_sz=-(-train_cfg.b_sz // self.n_dev) * self.n_dev)
        super().__init__(dataset, model_cfg, train_cfg,
                         checkpoint_fn=checkpoint_fn, table_cap=table_cap,
                         extend_batches=extend_batches,
                         lstm_hybrid=lstm_hybrid)
        # re-pad the node tables to a multiple of n_dev rows (padded rows:
        # degree 0 — never sampled, zero cache/h1 rows) and keep the
        # feature table consistent with them
        feats, neighbors, degrees = pad_node_tables(
            np.asarray(self.feats), np.asarray(self.neighbors),
            np.asarray(self.degrees), self.n_dev)
        self.feats = jnp.asarray(feats)
        self.neighbors = jnp.asarray(neighbors)
        self.degrees = jnp.asarray(degrees)

        tcfg, mcfg = self.tcfg, self.mcfg
        # refresh_every k > 1: a standalone sharded refresh runs every
        # k-th epoch; the reuse-mode epoch program consumes the held
        # row-sharded cache (train/cached_dist.py; mirrors the
        # single-device staleness path in cached_trainer.py)
        reuse = tcfg.refresh_every > 1
        self._dist_stale_cache = None
        if reuse:
            self._dist_refresh = make_cached_dist_refresh(
                mcfg, mesh, fanout=tcfg.fanout)
        if tcfg.learn_method == "sup":
            self._dist_epoch = make_cached_dist_epoch(
                mcfg, mesh, fanout=tcfg.fanout, lr=tcfg.lr,
                clip=tcfg.clip_norm, reuse_cache=reuse)
        else:
            self._dist_epoch = make_cached_dist_unsup_epoch(
                mcfg, mesh, unsup_loss=tcfg.unsup_loss, fanout=tcfg.fanout,
                lr=tcfg.lr, clip=tcfg.clip_norm,
                learn_method=tcfg.learn_method,
                q=self.pair_sampler.q, margin=self.pair_sampler.margin,
                reuse_cache=reuse)
        self._repl = NamedSharding(mesh, P())
        self._warmed = False  # first sharded epoch runs under the watchdog
        dist_epoch = self._dist_epoch

        def guarded(*args):
            if self._warmed:
                return dist_epoch(*args)
            from graphsage_tpu.utils.obs import collective_watchdog
            with collective_watchdog(
                    label="CachedDistTrainer first sharded epoch",
                    mesh=self.mesh):
                out = dist_epoch(*args)
                jax.block_until_ready(out)
            self._warmed = True
            return out

        self._dist_epoch = guarded

    # --------------------------------------------------------------- train
    def _dist_epoch_cache(self):
        """Row-sharded leaf cache under refresh_every=k: refreshed on
        epochs 0, k, 2k, ... and held (stale) in between."""
        if (self._dist_stale_cache is None
                or self.epoch % self.tcfg.refresh_every == 0):
            self._key, k_r = jax.random.split(self._key)
            if not self._warmed:
                # with refresh_every > 1 the FIRST sharded program run is
                # this refresh, not the epoch program — a first-compile
                # collective wedge here must hit the same watchdog the
                # epoch program gets (advisor r04); the epoch program's
                # own first run stays guarded until _warmed flips there
                from graphsage_tpu.utils.obs import collective_watchdog
                with collective_watchdog(
                        label="CachedDistTrainer first sharded refresh",
                        mesh=self.mesh):
                    out = self._dist_refresh(
                        k_r, self.feats, self.neighbors, self.degrees)
                    jax.block_until_ready(out)
                self._dist_stale_cache = out
            else:
                self._dist_stale_cache = self._dist_refresh(
                    k_r, self.feats, self.neighbors, self.degrees)
        return self._dist_stale_cache

    def train_epoch(self) -> float:
        tcfg = self.tcfg
        self._key, k_ep = jax.random.split(self._key)
        params = jax.device_put(self.params, self._repl)
        cache = (self._dist_epoch_cache() if tcfg.refresh_every > 1
                 else ())

        if tcfg.learn_method == "sup" and not self.extend_batches:
            batches, labels, row_masks = build_epoch_stack(
                self.ds.train_nodes, self.labels_np, self.n_dev,
                tcfg.b_sz, self.rng)
            visited = len(np.unique(self.ds.train_nodes))
            self.params, losses = self._dist_epoch(
                params, self.feats, self.neighbors, self.degrees, *cache,
                jnp.asarray(batches), jnp.asarray(labels),
                jnp.asarray(row_masks), k_ep)
        else:
            batches, labels, row_masks, pair_stack = \
                build_unsup_epoch_stack(
                    self.pair_sampler, self.ds.train_nodes, self.labels_np,
                    self.n_dev, tcfg.b_sz, tcfg.num_neg, self.rng)
            visited = len(np.unique(np.asarray(batches)[
                np.asarray(row_masks) > 0]))
            if tcfg.learn_method == "sup":
                # extended supervised batches through the sup epoch:
                # NLL over the pair-endpoint union rows (reference
                # src/utils.py:147-157 semantics), pair tensors unused
                self.params, losses = self._dist_epoch(
                    params, self.feats, self.neighbors, self.degrees,
                    *cache, batches, labels, row_masks, k_ep)
            else:
                self.params, losses = self._dist_epoch(
                    params, self.feats, self.neighbors, self.degrees,
                    *cache, batches, labels, row_masks, pair_stack, k_ep)

        # the epoch fetch is the steady-state sync — deadline-guarded
        # against the observed mid-run RPC wedge (utils/obs.py)
        from graphsage_tpu.utils.obs import fetch_with_deadline
        losses = fetch_with_deadline(
            losses, label=f"cached_dist epoch {self.epoch} loss fetch",
            convert=np.asarray)
        mean_loss = float(np.mean(losses))
        t = np.asarray(losses).shape[0]
        self.metrics.log("epoch", epoch=self.epoch, mean_loss=mean_loss,
                         visited_nodes=int(visited),
                         train_nodes=len(self.ds.train_nodes),
                         pipeline="cached_dist", steps=t,
                         n_dev=self.n_dev)
        return mean_loss
