"""Distributed trainer: the full supervised protocol over a device mesh.

Combines the pieces into a training loop for edge-partitioned graphs
(BASELINE config 5): locality reorder → sharded feature table → per-step
host frontier build (C++ sampler) → SPMD halo step → periodic best-val→test
evaluation.  On a multi-host slice each process feeds its own shard rows
(parallel/multihost.py); on one host the mesh spans local devices.

The evaluation protocol matches Trainer.evaluate (reference
src/utils.py:13-57) but embeds through the distributed forward.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graphsage_tpu.data.loaders import Dataset
from graphsage_tpu.models import GraphSageConfig, classifier_apply
from graphsage_tpu.models.graphsage import Frontier, graphsage_apply
from graphsage_tpu.models import init_graphsage
from graphsage_tpu.models.layers import init_classifier
from graphsage_tpu.parallel.halo import halo_gather_local, shard_features
from graphsage_tpu.parallel.partition import bfs_reorder, relabel_dataset
from graphsage_tpu.train.distributed import (
    build_dist_batch,
    dist_batch_to_device,
    make_dist_sup_step,
)
from graphsage_tpu.train.metrics import micro_f1


def make_dist_forward(mcfg: GraphSageConfig, mesh: Mesh,
                      axis: str = "data"):
    """jit'd forward: (sage_params, feats_sharded, dist tensors minus
    labels) -> [n_dev * b_loc, out_size] embeddings."""

    def fwd_local(sage_params, feats_local, requests, addr_owner,
                  addr_slot, addr_is_local, addr_local, f_idx, f_mask,
                  f_self):
        frontiers = [Frontier(idx=i[0], mask=m[0], self_idx=s[0])
                     for i, m, s in zip(f_idx, f_mask, f_self)]
        x0 = halo_gather_local(feats_local, requests[0], addr_owner[0],
                               addr_slot[0], addr_is_local[0],
                               addr_local[0], axis)
        return graphsage_apply(sage_params, mcfg, x0, frontiers)

    n_layers = mcfg.num_layers
    return jax.jit(shard_map(
        fwd_local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None, None)] * n_layers),
                  tuple([P(axis, None)] * n_layers)),
        out_specs=P(axis, None)))


@dataclasses.dataclass
class DistTrainConfig:
    learn_method: str = "sup"   # sup | unsup | plus_unsup
    unsup_loss: str = "normal"  # normal | margin
    b_loc: int = 128            # batch per device
    epochs: int = 10
    lr: float = 0.7
    clf_lr: float = 0.5
    clip: float = 5.0
    fanout: int = 10
    seed: int = 824
    clf_epochs: int = 60        # classifier-only fit (unsup mode)
    clf_b_sz: int = 50
    reorder: bool = True        # BFS locality reorder before sharding
    verbose: bool = True
    # build step i+1's frontier/halo plan (numpy + C++ sampler) on a worker
    # thread while the device mesh runs step i; 0 = serial reference path
    prefetch_depth: int = 2
    metrics_path: str | None = None  # jsonl metrics sink (utils/obs.py)

    @property
    def num_neg(self) -> int:
        return 6 if self.unsup_loss == "margin" else 100


class DistTrainer:
    def __init__(self, dataset: Dataset, mcfg: GraphSageConfig,
                 tcfg: DistTrainConfig, mesh: Mesh | None = None,
                 checkpoint_fn=None):
        """``checkpoint_fn(trainer, test_f1)`` fires on each val-F1
        improvement (same hook protocol as Trainer — reference best-val
        checkpoint semantics, src/utils.py:37-52)."""
        self.checkpoint_fn = checkpoint_fn
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        if tcfg.reorder:
            dataset = relabel_dataset(dataset, bfs_reorder(dataset.graph))
        self.ds = dataset
        self.mcfg = mcfg
        self.tcfg = tcfg
        self.rng = np.random.RandomState(tcfg.seed)

        key = jax.random.PRNGKey(tcfg.seed)

        @jax.jit
        def _init(key):
            k1, k2 = jax.random.split(key)
            return {
                "sage": init_graphsage(k1, mcfg),
                "clf": init_classifier(k2, mcfg.out_size,
                                       dataset.num_classes),
            }

        repl = NamedSharding(mesh, P())
        self.params = jax.device_put(jax.device_get(_init(key)), repl)
        self.feats_sharded = jax.device_put(
            jnp.asarray(shard_features(dataset.features, self.n_dev)),
            NamedSharding(mesh, P("data", None)))
        self._step = make_dist_sup_step(mcfg, mesh, lr=tcfg.lr,
                                        clip=tcfg.clip)
        if tcfg.learn_method != "sup":
            from graphsage_tpu.sampler import PairSampler
            from graphsage_tpu.train.distributed import make_dist_unsup_step
            self.pair_sampler = PairSampler(dataset.graph,
                                            dataset.train_nodes)
            # overlap the one-time closure build with the first sharded
            # compile (PAIRS_SCALE_r04.json; bit-identical to lazy)
            self.pair_sampler.prewarm_async(dataset.train_nodes)
            self._unsup_step = make_dist_unsup_step(
                mcfg, mesh, unsup_loss=tcfg.unsup_loss,
                learn_method=tcfg.learn_method, lr=tcfg.lr, clip=tcfg.clip)
        self._fwd = make_dist_forward(mcfg, mesh)
        self.max_vali_f1 = 0.0
        self.epoch = 0
        self.history: list[dict] = []
        self._warmed = False  # first sharded step runs under the watchdog
        # structured metrics, same protocol as Trainer (trainer.py:375):
        # the pipeline aimed at config-5 production runs must emit the
        # north-star metric machine-readably (VERDICT r04 weak #4)
        from graphsage_tpu.utils.obs import MetricsLogger
        self.metrics = MetricsLogger(tcfg.metrics_path)

    def _run_step(self, step_fn, *args):
        """Run one sharded step; the FIRST one executes under the
        collective-deadlock watchdog (utils/obs.py) so a wrong mesh on a
        real slice produces diagnostics instead of a silent hang."""
        if self._warmed:
            return step_fn(*args)
        from graphsage_tpu.utils.obs import collective_watchdog
        with collective_watchdog(
                label=f"{type(self).__name__} first sharded step",
                mesh=self.mesh):
            out = step_fn(*args)
            jax.block_until_ready(out)
        self._warmed = True
        return out

    # ---------------------------------------------------------------- train
    def _build_step_batch(self, chunk: np.ndarray, per_step: int):
        """Host-side (numpy + C++ sampler) build for one distributed step:
        tail padding, frontier construction, halo planning.  Runs on the
        prefetch thread; consumes self.rng sequentially."""
        tcfg = self.tcfg
        real = len(chunk)
        if real < per_step:  # pad the tail step with repeats
            chunk = np.resize(chunk, per_step)
        batch = chunk.reshape(self.n_dev, tcfg.b_loc)
        if tcfg.learn_method == "sup":
            valid = (np.arange(per_step) < real).reshape(self.n_dev,
                                                         tcfg.b_loc)
            db = build_dist_batch(self.ds.graph, self.ds.labels, batch,
                                  self.mcfg.num_layers, tcfg.fanout,
                                  seed=int(self.rng.randint(2**31)),
                                  valid=valid)
            return db, None
        from graphsage_tpu.train.distributed import build_dist_unsup_batch
        valid = (np.arange(per_step) < real).reshape(self.n_dev,
                                                     tcfg.b_loc)
        return build_dist_unsup_batch(
            self.ds.graph, self.ds.labels, self.pair_sampler,
            batch, self.mcfg.num_layers, tcfg.fanout,
            num_neg=tcfg.num_neg, seed=int(self.rng.randint(2**31)),
            target_valid=valid)

    def train_epoch(self) -> float:
        """One epoch over the mesh.  Host batch building (frontiers + halo
        plan) overlaps device compute via a bounded prefetch thread
        (utils/prefetch.py); device transfers stay on this thread."""
        import time as _time

        tcfg = self.tcfg
        order = self.rng.permutation(self.ds.train_nodes)
        per_step = self.n_dev * tcfg.b_loc
        steps = max(1, len(order) // per_step)
        losses = []
        t_ep = _time.perf_counter()

        def producer():
            for si in range(steps):
                chunk = order[si * per_step:(si + 1) * per_step]
                yield self._build_step_batch(chunk, per_step)

        from graphsage_tpu.utils.prefetch import Prefetcher, prefetch
        stream = prefetch(producer, depth=tcfg.prefetch_depth,
                          enabled=tcfg.prefetch_depth > 0)
        try:
            for db, pairs in stream:
                if pairs is None:
                    args = dist_batch_to_device(db, self.mesh)
                    self.params, loss = self._run_step(
                        self._step, self.params, self.feats_sharded, *args)
                else:
                    from graphsage_tpu.train.distributed import (
                        pairs_to_device,
                    )
                    self.params, loss = self._run_step(
                        self._unsup_step, self.params, self.feats_sharded,
                        *dist_batch_to_device(db, self.mesh),
                        *pairs_to_device(pairs, self.mesh))
                losses.append(loss)
        except BaseException:
            if isinstance(stream, Prefetcher):
                stream.close()
            raise
        from graphsage_tpu.utils.obs import fetch_with_deadline
        mean_loss = float(np.mean([
            fetch_with_deadline(l, label=f"dist step {i} loss fetch")
            for i, l in enumerate(losses)]))
        epoch_s = _time.perf_counter() - t_ep
        from graphsage_tpu.train.dense import edges_per_batch
        edges = steps * edges_per_batch(per_step, self.mcfg.num_layers,
                                        tcfg.fanout)
        self.metrics.log("epoch", epoch=self.epoch, mean_loss=mean_loss,
                         steps=steps, nodes_per_step=per_step,
                         epoch_s=round(epoch_s, 3),
                         edges_per_sec=round(edges / epoch_s, 1),
                         n_dev=self.n_dev)
        if tcfg.verbose:
            print(f"dist epoch {self.epoch}: mean loss {mean_loss:.4f} "
                  f"({steps} steps x {per_step} nodes)")
        return mean_loss

    # ----------------------------------------------------------------- eval
    def embed_nodes(self, nodes: np.ndarray) -> np.ndarray:
        """Distributed forward over arbitrary nodes (padded to a full
        device grid)."""
        per = self.n_dev * self.tcfg.b_loc
        out = np.zeros((len(nodes), self.mcfg.out_size), np.float32)
        for lo in range(0, len(nodes), per):
            chunk = nodes[lo:lo + per]
            real = len(chunk)
            if real < per:
                chunk = np.resize(chunk, per)
            batch = np.asarray(chunk).reshape(self.n_dev, self.tcfg.b_loc)
            db = build_dist_batch(self.ds.graph, self.ds.labels, batch,
                                  self.mcfg.num_layers, self.tcfg.fanout,
                                  seed=int(self.rng.randint(2**31)))
            args = dist_batch_to_device(db, self.mesh)
            embs = self._fwd(self.params["sage"], self.feats_sharded,
                             *args[:-2])
            out[lo:lo + real] = np.asarray(embs)[:real]
        return out

    def evaluate(self) -> float:
        val, test = self.ds.val_nodes, self.ds.test_nodes
        logp = classifier_apply(self.params["clf"],
                                jnp.asarray(self.embed_nodes(val)))
        pred = np.asarray(jnp.argmax(logp, axis=1))
        vali_f1 = micro_f1(self.ds.labels[val], pred)
        entry = {"epoch": self.epoch, "val_f1": vali_f1}
        self.metrics.log("eval", epoch=self.epoch, val_f1=vali_f1)
        if self.tcfg.verbose:
            print(f"Validation F1: {vali_f1:.4f}")
        if vali_f1 > self.max_vali_f1:
            self.max_vali_f1 = vali_f1
            logp = classifier_apply(self.params["clf"],
                                    jnp.asarray(self.embed_nodes(test)))
            pred = np.asarray(jnp.argmax(logp, axis=1))
            entry["test_f1"] = micro_f1(self.ds.labels[test], pred)
            self.metrics.log("test", epoch=self.epoch,
                             test_f1=entry["test_f1"])
            if self.tcfg.verbose:
                print(f"Test F1: {entry['test_f1']:.4f}")
            if self.checkpoint_fn is not None:
                self.checkpoint_fn(self, entry["test_f1"])
        self.history.append(entry)
        return self.max_vali_f1

    def train_classification(self) -> float:
        """Classifier-only fit on frozen distributed embeddings (the
        reference's unsup protocol, src/utils.py:80-111, over the
        distributed forward)."""
        import jax.numpy as jnp
        from graphsage_tpu.losses import supervised_nll
        from graphsage_tpu.train.optim import (
            clip_by_global_norm,
            sgd_update,
        )

        tcfg = self.tcfg
        all_nodes = np.arange(self.ds.num_nodes)
        embs = self.embed_nodes(all_nodes)

        @jax.jit
        def clf_step(clf, e, lab):
            def loss_fn(p):
                logp = classifier_apply(p, e)
                return supervised_nll(logp, lab,
                                      jnp.ones(lab.shape[0], jnp.float32))

            _, grads = jax.value_and_grad(loss_fn)(clf)
            grads = clip_by_global_norm(grads, tcfg.clip)
            return sgd_update(clf, grads, tcfg.clf_lr)

        from jax.sharding import NamedSharding as _NS

        clf = jax.device_get(self.params["clf"])
        clf = jax.tree_util.tree_map(jnp.asarray, clf)
        train = np.asarray(self.ds.train_nodes)
        best = self.max_vali_f1
        for _ in range(tcfg.clf_epochs):
            order = self.rng.permutation(train)
            for lo in range(0, len(order), tcfg.clf_b_sz):
                nodes = order[lo:lo + tcfg.clf_b_sz]
                clf = clf_step(clf, jnp.asarray(embs[nodes]),
                               jnp.asarray(self.ds.labels[nodes]
                                           .astype(np.int32)))
            # best-val→test selection must see EVERY clf epoch, exactly
            # as Trainer.train_classification evaluates per epoch
            # (trainer.py:405) — a single final eval would judge only the
            # last classifier state and miss the best one
            self.params["clf"] = jax.device_put(
                jax.device_get(clf), _NS(self.mesh, P()))
            best = self.evaluate()
        return best

    def fit(self) -> float:
        """Full outer loop.  Starts at ``self.epoch`` so a resumed trainer
        continues from the checkpointed epoch (same contract as
        Trainer.fit; the reference is save-only, src/utils.py:52)."""
        for epoch in range(self.epoch, self.tcfg.epochs):
            self.epoch = epoch
            self.train_epoch()
            if self.tcfg.learn_method == "unsup":
                # periodic classifier fit (reference src/main.py:73-74)
                if (epoch + 1) % 2 == 0:
                    self.train_classification()
            else:
                self.evaluate()
        return self.max_vali_f1
