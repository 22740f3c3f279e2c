"""Quality validation for the leaf-cached pipeline (train/cached.py).

Trains Cora supervised with the reference protocol shape (50 epochs,
shuffled batches, SGD 0.7 + clip 5, best-val→test micro-F1) entirely on
the cached pipeline, and prints per-epoch F1.  The bar: match the per-step
pipelines' F1 (BASELINE.md records 0.9446 val / 0.9346 test for the
compact trainer at these settings).

Usage: python tools/validate_cached.py [--dataSet cora] [--epochs 50]
       [--b_sz 512] [--compute_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataSet", type=str, default="cora")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--b_sz", type=int, default=512)
    ap.add_argument("--fanout", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.7)
    ap.add_argument("--compute_dtype", type=str, default="float32")
    ap.add_argument("--seed", type=int, default=824)
    ap.add_argument("--cap", type=int, default=None,
                    help="neighbor-table width cap (None = full degree)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data import load_dataset
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import classifier_apply, init_classifier
    from graphsage_tpu.train.cached import (
        cached_forward,
        make_cached_sup_epoch,
        refresh_leaf_cache,
    )
    from graphsage_tpu.train.metrics import micro_f1

    ds = load_dataset(args.dataSet, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    pad = (ds.graph.to_padded() if args.cap is None
           else ds.graph.to_padded_sampled(args.cap, rng))
    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=args.hidden,
                           compute_dtype=args.compute_dtype)
    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    params = {"sage": init_graphsage(k1, mcfg),
              "clf": init_classifier(k2, args.hidden, ds.num_classes)}
    feats = jnp.asarray(ds.features)
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    labels_all = ds.labels.astype(np.int32)

    epoch_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=args.fanout,
                                             lr=args.lr))

    def embed(nodes, ekey):
        mean_feats, cnt = refresh_leaf_cache(ekey, feats, neighbors,
                                             degrees, args.fanout)
        return cached_forward(params, mcfg, feats, mean_feats, cnt,
                              neighbors, degrees,
                              jnp.asarray(nodes.astype(np.int32)),
                              ekey, fanout=args.fanout)

    train_nodes = ds.train_nodes
    b = args.b_sz
    best_val, best_test = 0.0, None
    t_start = time.time()
    for ep in range(args.epochs):
        order = rng.permutation(train_nodes)
        t = max(1, len(order) // b)
        batches = np.resize(order[:t * b], (t, b)).astype(np.int32)
        labels = labels_all[batches]
        params, losses = epoch_fn(params, feats, neighbors, degrees,
                                  jnp.asarray(batches), jnp.asarray(labels),
                                  jax.random.PRNGKey(args.seed * 1000 + ep))
        mean_loss = float(np.mean(np.asarray(losses)))
        ekey = jax.random.PRNGKey(7000 + ep)
        val_emb = embed(ds.val_nodes, ekey)
        pred = np.asarray(jnp.argmax(
            classifier_apply(params["clf"], val_emb), axis=1))
        val_f1 = micro_f1(labels_all[ds.val_nodes], pred)
        line = f"epoch {ep}: loss {mean_loss:.4f} val_f1 {val_f1:.4f}"
        if val_f1 > best_val:
            best_val = val_f1
            test_emb = embed(ds.test_nodes, jax.random.PRNGKey(9000 + ep))
            pred_t = np.asarray(jnp.argmax(
                classifier_apply(params["clf"], test_emb), axis=1))
            best_test = micro_f1(labels_all[ds.test_nodes], pred_t)
            line += f" test_f1 {best_test:.4f}"
        print(line, flush=True)
    print(f"BEST val {best_val:.4f} test {best_test:.4f} "
          f"({time.time() - t_start:.0f}s wall)")


if __name__ == "__main__":
    main()
