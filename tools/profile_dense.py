"""Ablation profiler for the dense train step: where does the time go?

Times (a) the full supervised step, (b) forward only, (c) sampling only —
each as one lax.scan program so per-step dispatch is excluded — on the
bench.py workload.  Use to target optimizations; see BASELINE.md for the
measured progression.

Usage: python tools/profile_dense.py [--cap 32] [--batch 512] [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--fanout", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data import load_cora
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.sampler.device import sample_frontiers_dense
    from graphsage_tpu.train.dense import dense_forward, make_dense_sup_epoch

    ds = load_cora()
    pad = ds.graph.to_padded()
    if args.cap:
        pad = pad.subsample(args.cap, np.random.RandomState(99))
    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=128)
    key = jax.random.PRNGKey(0)
    params = {"sage": init_graphsage(key, mcfg),
              "clf": init_classifier(key, 128, ds.num_classes)}
    feats = jnp.asarray(ds.features)
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    labels_all = jnp.asarray(ds.labels.astype(np.int32))

    rng = np.random.RandomState(0)
    t, b = args.steps, args.batch
    batches = jnp.asarray(rng.randint(0, ds.num_nodes, (t, b)).astype(np.int32))
    labels = labels_all[batches]

    def timeit(name, fn, *fargs):
        out = fn(*fargs)
        jax.tree_util.tree_map(np.asarray, out)
        t0 = time.perf_counter()
        out = fn(*fargs)
        jax.tree_util.tree_map(np.asarray, out)
        print(f"{name}: {(time.perf_counter() - t0) / t * 1000:.3f} ms/step")

    epoch = jax.jit(make_dense_sup_epoch(mcfg, fanout=args.fanout))
    timeit("full_step", lambda: epoch(params, feats, neighbors, degrees,
                                      batches, labels, key)[1])

    def fwd_epoch(params, batches, key):
        def body(k, batch):
            k, sub = jax.random.split(k)
            e = dense_forward(params, mcfg, feats, neighbors, degrees,
                              batch, sub, args.fanout)
            return k, jnp.sum(e)
        _, s = jax.lax.scan(body, key, batches)
        return s

    timeit("forward_only", jax.jit(fwd_epoch), params, batches, key)

    def samp_epoch(batches, key):
        def body(k, batch):
            k, sub = jax.random.split(k)
            x0_ids, fr = sample_frontiers_dense(sub, neighbors, degrees,
                                                batch, 2, args.fanout)
            return k, jnp.sum(x0_ids) + jnp.sum(fr[0].mask)
        _, s = jax.lax.scan(body, key, batches)
        return s

    timeit("sampling_only", jax.jit(samp_epoch), batches, key)


if __name__ == "__main__":
    main()
