"""Training loops: sup / unsup / plus_unsup, with the reference's protocol.

Maps the reference's host-loop architecture (src/utils.py:113-193
``apply_model``, :80-111 ``train_classification``, :13-57 ``evaluate``)
onto a jit-compiled device step:

- per batch, the host extends the batch with walk-positive / BFS-negative
  pair endpoints (reference src/utils.py:149 — done for *every* learn
  method) and compiles the sampled computation graph to fixed-shape
  frontier tensors;
- the device step — feature gather, L-layer encode, loss, grads, per-model
  clip, SGD — is ONE traced XLA program per shape bucket;
- evaluation embeds val/test with fresh sampling and scores micro-F1 with
  the best-val→test checkpoint protocol (src/utils.py:27-52).

Reference hyperparameters preserved as defaults: joint SGD lr 0.7, clip 5
(src/utils.py:136,185-186), classifier-only lr 0.5 / 800 epochs / b_sz 50
(src/utils.py:82-85), embedding batches of 500 (src/utils.py:63),
num_neg 100 for 'normal' / 6 for 'margin' (src/utils.py:119-122).
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.loaders import Dataset
from graphsage_tpu.losses import supervised_nll, unsup_loss_from_pairbatch
from graphsage_tpu.utils.obs import (
    fetch_with_deadline,
    maybe_inject_test_wedge,
)
from graphsage_tpu.models import (
    GraphSageConfig,
    classifier_apply,
    init_classifier,
    init_graphsage,
)
from graphsage_tpu.sampler import PairSampler, build_compact_batch
from graphsage_tpu.sampler.compact import _bucket
from graphsage_tpu.train.metrics import micro_f1
from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update


@dataclasses.dataclass
class TrainConfig:
    learn_method: str = "sup"        # sup | unsup | plus_unsup
    unsup_loss: str = "normal"       # normal | margin
    b_sz: int = 20
    epochs: int = 50
    lr: float = 0.7
    clf_lr: float = 0.5
    clip_norm: float = 5.0
    fanout: int = 10
    seed: int = 824
    clf_epochs: int = 800
    clf_b_sz: int = 50
    emb_b_sz: int = 500
    # strict=True (default — protocol-identical to the reference,
    # src/utils.py:110 → :27) re-embeds val/test through the encoder with
    # fresh neighbor sampling on every classifier epoch, so the best-val→test
    # selection sees the same eval variance as the reference.  False scores
    # the classifier on the cached full-graph embeddings (~800x fewer
    # encoder invocations) — an explicit fast path whose reported F1 is NOT
    # protocol-identical.
    strict_clf_eval: bool = True
    verbose: bool = True
    metrics_path: str | None = None   # jsonl metrics sink (utils/obs.py)
    # host/device overlap: build batch i+1 (pair sampling + C++ compact
    # build, numpy-only) on a worker thread while the device runs step i.
    # depth bounds how far the host may run ahead.  0 disables (serial
    # reference path).  Bit-identical to serial — see utils/prefetch.py.
    prefetch_depth: int = 2
    # cached pipeline only: refresh the leaf cache every k epochs instead
    # of every epoch (k=1, the default, keeps round-3 semantics exactly).
    # The refresh is the 1M-node workload's biggest cost slice
    # (PROFILE_BIGSCALE.json); staleness k amortizes it k-fold.  Quality
    # vs k: STALENESS_r04.json.
    refresh_every: int = 1

    @property
    def num_neg(self) -> int:
        if self.unsup_loss == "margin":
            return 6
        if self.unsup_loss == "normal":
            return 100
        raise ValueError("unsup_loss can be only 'margin' or 'normal'.")


def _pair_tensors(pb) -> dict:
    return {
        "pos_q": jnp.asarray(pb.pos_q),
        "pos_mask": jnp.asarray(pb.pos_mask),
        "neg_q": jnp.asarray(pb.neg_q),
        "neg_mask": jnp.asarray(pb.neg_mask),
        "node_valid": jnp.asarray(pb.node_valid),
        # presence of target_rows routes the losses through the dense
        # SDDMM score block (ops/sddmm.py) instead of per-pair gathers
        "target_rows": jnp.asarray(pb.target_rows),
    }


class Trainer:
    def __init__(self, dataset: Dataset, model_cfg: GraphSageConfig,
                 train_cfg: TrainConfig,
                 checkpoint_fn: Callable | None = None):
        self.ds = dataset
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.checkpoint_fn = checkpoint_fn

        key = jax.random.PRNGKey(train_cfg.seed)

        # one jitted init program instead of ~10 eager ops: on remote-compile
        # TPU backends each eager op costs a compile round-trip
        @jax.jit
        def _init(key):
            k_sage, k_clf = jax.random.split(key)
            return {
                "sage": init_graphsage(k_sage, model_cfg),
                "clf": init_classifier(k_clf, model_cfg.out_size,
                                       dataset.num_classes),
            }

        self.params = _init(key)
        # hold the (constant) feature table in the compute dtype: in bf16
        # mode every downstream gather — the epoch cache refresh above all —
        # moves half the bytes, and aggregation sums accumulate in f32
        # (ops/aggregate.py) so the mean loses nothing
        self.feats = jnp.asarray(dataset.features,
                                 dtype=jnp.dtype(model_cfg.compute_dtype))
        self.labels_np = np.asarray(dataset.labels)
        self.rng = np.random.RandomState(train_cfg.seed)
        self.pair_sampler = PairSampler(dataset.graph, dataset.train_nodes)
        # overlap the one-time exact-negative closure build with the first
        # compile (which takes minutes on remote backends): bit-identical
        # to lazy building, ~159 s hidden at 100k-node scale
        # (PAIRS_SCALE_r04.json; no-op in uniform mode / when tiny)
        self.pair_sampler.prewarm_async(dataset.train_nodes)
        self.max_vali_f1 = 0.0
        self.epoch = 0
        self.history: list[dict] = []
        self._warmed = False   # first step runs under a warmup watchdog
        from graphsage_tpu.utils.obs import MetricsLogger
        self.metrics = MetricsLogger(train_cfg.metrics_path)

        self._step_fn = self._build_step_fn()
        self._embed_fn = jax.jit(self._embed_impl)
        self._clf_step_fn = jax.jit(self._clf_step_impl)

    # ------------------------------------------------------------------ jit
    # NB: feats is an explicit argument (not a closure capture) so the
    # feature table is not baked into every compiled program as a constant.
    def _embed_impl(self, sage_params, feats, x0_ids, frontiers):
        from graphsage_tpu.models.graphsage import graphsage_apply_gathered
        from graphsage_tpu.train.dense import cast_compute
        return graphsage_apply_gathered(cast_compute(sage_params, self.mcfg),
                                        self.mcfg,
                                        cast_compute(feats, self.mcfg),
                                        x0_ids, frontiers)

    def _build_step_fn(self):
        mcfg, tcfg = self.mcfg, self.tcfg

        @jax.jit
        def step(params, feats, x0_ids, frontiers, labels, row_mask, pairs):
            def loss_fn(p):
                from graphsage_tpu.models.graphsage import (
                    graphsage_apply_gathered,
                )
                from graphsage_tpu.train.dense import cast_compute
                p = cast_compute(p, mcfg)   # master grads stay f32
                embs = graphsage_apply_gathered(p["sage"], mcfg,
                                                cast_compute(feats, mcfg),
                                                x0_ids, frontiers)
                if tcfg.learn_method in ("sup", "plus_unsup"):
                    logp = classifier_apply(p["clf"], embs)
                    loss_sup = supervised_nll(logp, labels, row_mask)
                else:
                    loss_sup = 0.0
                if tcfg.learn_method in ("unsup", "plus_unsup"):
                    loss_net = unsup_loss_from_pairbatch(
                        embs, pairs, tcfg.unsup_loss,
                        q=self.pair_sampler.q,
                        margin=self.pair_sampler.margin)
                else:
                    loss_net = 0.0
                return loss_sup + loss_net

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # per-model clip, reference src/utils.py:185-186
            grads = {k: clip_by_global_norm(g, tcfg.clip_norm)
                     for k, g in grads.items()}
            new_params = sgd_update(params, grads, tcfg.lr)
            return new_params, loss

        return step

    def _clf_step_impl(self, clf_params, embs, labels, row_mask):
        def loss_fn(p):
            logp = classifier_apply(p, embs)
            return supervised_nll(logp, labels, row_mask)

        loss, grads = jax.value_and_grad(loss_fn)(clf_params)
        grads = clip_by_global_norm(grads, self.tcfg.clip_norm)
        return sgd_update(clf_params, grads, self.tcfg.clf_lr), loss

    # ----------------------------------------------------------- embedding
    def embed_nodes(self, nodes: np.ndarray, sage_params=None) -> np.ndarray:
        """Encoder forward for arbitrary nodes with fresh sampling
        (reference graphSage(nodes) call sites)."""
        sage_params = sage_params or self.params["sage"]
        nodes = np.asarray(nodes)
        pad = _bucket(len(nodes))
        padded = np.zeros(pad, dtype=np.int64)
        padded[:len(nodes)] = nodes
        cb = build_compact_batch(self.ds.graph, padded, self.rng,
                                 num_layers=self.mcfg.num_layers,
                                 fanout=self.tcfg.fanout, gcn=self.mcfg.gcn,
                                 shuffle_slots=self.mcfg.agg_func == "LSTM")
        frontiers = jax.tree_util.tree_map(jnp.asarray, list(cb.frontiers))
        embs = self._embed_fn(sage_params, self.feats,
                              jnp.asarray(cb.x0_ids), frontiers)
        # f32 on host regardless of compute dtype (bf16 numpy arrays trip
        # downstream sklearn/np consumers)
        return np.asarray(embs).astype(np.float32)[:len(nodes)]

    def all_embeddings(self) -> np.ndarray:
        """Full-graph inference in batches (reference get_gnn_embeddings,
        src/utils.py:59-78)."""
        n = self.ds.num_nodes
        b = self.tcfg.emb_b_sz
        out = np.zeros((n, self.mcfg.out_size), dtype=np.float32)
        for lo in range(0, n, b):
            nodes = np.arange(lo, min(lo + b, n))
            out[nodes] = self.embed_nodes(nodes)
        return out

    # ---------------------------------------------------------------- eval
    def _predict(self, nodes: np.ndarray, embs: np.ndarray | None = None
                 ) -> np.ndarray:
        if embs is None:
            embs = self.embed_nodes(nodes)
        logp = classifier_apply(self.params["clf"], jnp.asarray(embs))
        return np.asarray(jnp.argmax(logp, axis=1))

    def evaluate(self, cached_embs: np.ndarray | None = None) -> float:
        """Best-val→test protocol (reference src/utils.py:13-57): compute
        val micro-F1; on improvement compute test micro-F1 and checkpoint."""
        val, test = self.ds.val_nodes, self.ds.test_nodes
        pred = self._predict(val, None if cached_embs is None
                             else cached_embs[val])
        vali_f1 = micro_f1(self.labels_np[val], pred)
        if self.tcfg.verbose:
            print(f"Validation F1: {vali_f1:.4f}")
        entry = {"epoch": self.epoch, "val_f1": vali_f1}
        self.metrics.log("eval", epoch=self.epoch, val_f1=vali_f1)
        if vali_f1 > self.max_vali_f1:
            self.max_vali_f1 = vali_f1
            pred_t = self._predict(test, None if cached_embs is None
                                   else cached_embs[test])
            test_f1 = micro_f1(self.labels_np[test], pred_t)
            entry["test_f1"] = test_f1
            self.metrics.log("test", epoch=self.epoch, test_f1=test_f1)
            if self.tcfg.verbose:
                print(f"Test F1: {test_f1:.4f}")
            if self.checkpoint_fn is not None:
                self.checkpoint_fn(self, test_f1)
        self.history.append(entry)
        return self.max_vali_f1

    # --------------------------------------------------------------- train
    def _build_train_batch(self, nodes: np.ndarray):
        """Host-side (numpy-only) batch construction for one step: batch
        extension (reference src/utils.py:147-149, every learn method) +
        compact frontier build + labels/mask.  Runs on the prefetch thread;
        consumes self.rng sequentially (see utils/prefetch.py contract)."""
        tcfg = self.tcfg
        pb = self.pair_sampler.sample_batch(nodes, tcfg.num_neg, self.rng)
        cb = build_compact_batch(
            self.ds.graph, pb.unique_nodes, self.rng,
            num_layers=self.mcfg.num_layers, fanout=tcfg.fanout,
            gcn=self.mcfg.gcn,
            shuffle_slots=self.mcfg.agg_func == "LSTM")
        u_pad = cb.out_rows
        labels = np.zeros(u_pad, dtype=np.int32)
        real = pb.unique_nodes[:pb.num_unique]
        labels[:pb.num_unique] = self.labels_np[real]
        row_mask = (np.arange(u_pad) < pb.num_unique).astype(np.float32)
        return pb, cb, labels, row_mask

    def train_epoch(self) -> float:
        """One joint epoch over the train split (reference apply_model,
        src/utils.py:113-193).  Returns the mean step loss.

        Batch building overlaps device compute: a worker thread runs
        ``_build_train_batch`` for step i+1 while the device executes
        step i (prefetch_depth bounds the run-ahead; 0 = serial)."""
        tcfg = self.tcfg
        train_nodes = self.rng.permutation(self.ds.train_nodes)
        batches = math.ceil(len(train_nodes) / tcfg.b_sz)
        visited: set[int] = set()
        losses = []

        def producer():
            for bi in range(batches):
                nodes = train_nodes[bi * tcfg.b_sz:(bi + 1) * tcfg.b_sz]
                yield self._build_train_batch(nodes)

        from graphsage_tpu.utils.prefetch import Prefetcher, prefetch
        stream = prefetch(producer, depth=tcfg.prefetch_depth,
                          enabled=tcfg.prefetch_depth > 0)
        try:
            for bi, (pb, cb, labels, row_mask) in enumerate(stream):
                visited.update(int(v)
                               for v in pb.unique_nodes[:pb.num_unique])
                frontiers = jax.tree_util.tree_map(jnp.asarray,
                                                   list(cb.frontiers))
                if not self._warmed:
                    # first step = compile + first execution; on remote
                    # TPU backends the first execution alone has been
                    # observed to take minutes — tell the operator it is
                    # warmup, not a hang (utils/obs.py watchdog)
                    from graphsage_tpu.utils.obs import collective_watchdog
                    with collective_watchdog(
                            label="first train step (compile/warmup; "
                                  "remote TPU first-execution can take "
                                  "minutes — not a hang unless repeated)",
                            timeout_s=float(os.environ.get(
                                "GS_WATCHDOG_TIMEOUT_S", "120"))):
                        self.params, loss = self._step_fn(
                            self.params, self.feats,
                            jnp.asarray(cb.x0_ids), frontiers,
                            jnp.asarray(labels), jnp.asarray(row_mask),
                            _pair_tensors(pb))
                        jax.block_until_ready(loss)
                    self._warmed = True
                else:
                    self.params, loss = self._step_fn(
                        self.params, self.feats, jnp.asarray(cb.x0_ids),
                        frontiers, jnp.asarray(labels),
                        jnp.asarray(row_mask), _pair_tensors(pb))
                if tcfg.verbose:
                    # per-step loss print (reference src/utils.py:183)
                    # forces a device sync each batch; deadline-guarded —
                    # the remote backend has wedged MID-RUN fetches
                    # (utils/obs.py fetch_with_deadline)
                    loss = fetch_with_deadline(
                        loss, label=f"step {bi + 1} loss fetch")
                    print(f"Step [{bi + 1}/{batches}], Loss: {loss:.4f}, "
                          f"Dealed Nodes [{len(visited)}/"
                          f"{len(train_nodes)}]")
                losses.append(loss)
                # quiet mode keeps a bounded dispatch window: sync the loss
                # from a few steps back so dispatch runs ahead of the device
                # (hides per-step latency) without flooding the backend
                # queue (unbounded async dispatch deadlocks the remote TPU
                # backend)
                if not tcfg.verbose and bi >= 4:
                    losses[bi - 4] = fetch_with_deadline(
                        losses[bi - 4],
                        label=f"step {bi - 3} loss fetch (dispatch window)")
        except BaseException:
            if isinstance(stream, Prefetcher):
                stream.close()  # unblock + join the producer thread
            raise
        mean_loss = float(np.mean([
            l if isinstance(l, float) else
            fetch_with_deadline(l, label="epoch-end loss drain")
            for l in losses]))
        self.metrics.log("epoch", epoch=self.epoch, mean_loss=mean_loss,
                         visited_nodes=len(visited),
                         train_nodes=len(train_nodes))
        return mean_loss

    def train_classification(self) -> float:
        """Classifier-only fit on frozen embeddings (reference
        src/utils.py:80-111): fresh-embedding pass, then clf_epochs x
        batches of SGD(clf_lr) with eval per epoch."""
        tcfg = self.tcfg
        feats = self.all_embeddings()
        feats_j = jnp.asarray(feats)
        train_nodes = np.asarray(self.ds.train_nodes)
        b = tcfg.clf_b_sz
        for ep in range(tcfg.clf_epochs):
            order = self.rng.permutation(train_nodes)
            for lo in range(0, len(order), b):
                nodes = order[lo:lo + b]
                pad = _bucket(len(nodes), minimum=b)
                emb_b = np.zeros((pad, feats.shape[1]), np.float32)
                lab_b = np.zeros(pad, np.int32)
                emb_b[:len(nodes)] = feats[nodes]
                lab_b[:len(nodes)] = self.labels_np[nodes]
                mask = (np.arange(pad) < len(nodes)).astype(np.float32)
                self.params["clf"], _ = self._clf_step_fn(
                    self.params["clf"], jnp.asarray(emb_b),
                    jnp.asarray(lab_b), jnp.asarray(mask))
            self.evaluate(cached_embs=None if tcfg.strict_clf_eval
                          else feats)
        return self.max_vali_f1

    def fit(self) -> float:
        """Full outer loop (reference src/main.py:70-76).  Starts at
        ``self.epoch`` so a resumed trainer continues from the checkpointed
        epoch instead of re-running the full count."""
        tcfg = self.tcfg
        for epoch in range(self.epoch, tcfg.epochs):
            self.epoch = epoch
            maybe_inject_test_wedge(epoch)
            if tcfg.verbose:
                print(f"----------------------EPOCH {epoch}"
                      "-----------------------")
            t0 = time.time()
            mean_loss = self.train_epoch()
            dt = time.time() - t0
            if tcfg.verbose:
                print(f"epoch {epoch}: mean loss {mean_loss:.4f} "
                      f"({dt:.1f}s)")
            if tcfg.learn_method == "unsup":
                if (epoch + 1) % 2 == 0:
                    self.train_classification()
            else:
                self.evaluate()
        return self.max_vali_f1
