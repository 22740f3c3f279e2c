"""Headline benchmark: aggregation-engine training throughput, edges/s/chip.

Workload (BASELINE.json north star, config-1 shape): supervised GraphSAGE
train step — neighbor sampling, 2-layer MEAN aggregation fwd+bwd, NLL,
per-model clip, SGD — on the real Cora graph (1433-dim features), fanout 10.
The dense device pipeline runs the whole step as one jit'd XLA program.

Baseline: the reference implementation (torch CPU, same machine class)
measured at 409,565 edges/s steady-state (batch 512; it is host-bound and
flat in batch size — 407,913 edges/s at its default batch 20).  See
BASELINE.md "measured" rows; tools/measure_reference.py reproduces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_EDGES_PER_SEC = 409_565.0  # torch-CPU reference, measured


def main() -> None:
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data import load_cora
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.train.dense import (
        edges_per_batch,
        make_dense_sup_epoch,
    )

    batch_size = 512
    fanout = 10
    ds = load_cora()
    # width-32 neighbor-cache table: sampling K of a random cap-subset is
    # EXACTLY uniform K-of-degree (subset composition; see
    # PaddedAdjacency.subsample), and the 5x narrower table cuts the
    # device-side sampling work, which dominates the step.  Production
    # refreshes the subset per epoch; a 50-step window shares one refresh.
    pad = ds.graph.to_padded().subsample(32, np.random.RandomState(99))

    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=128)
    key = jax.random.PRNGKey(824)
    k1, k2 = jax.random.split(key)
    params = {
        "sage": init_graphsage(k1, mcfg),
        "clf": init_classifier(k2, mcfg.out_size, ds.num_classes),
    }
    feats = jnp.asarray(ds.features)
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    labels_all = jnp.asarray(ds.labels.astype(np.int32))

    epoch_fn = jax.jit(make_dense_sup_epoch(mcfg, fanout=fanout))

    rng = np.random.RandomState(0)
    n_steps = 50
    batches = jnp.asarray(
        rng.randint(0, ds.num_nodes,
                    size=(n_steps, batch_size)).astype(np.int32))
    labels = jnp.take(labels_all, batches, axis=0)
    key = jax.random.PRNGKey(824)

    # warmup + compile (whole scan is one program)
    params_w, losses = epoch_fn(params, feats, neighbors, degrees,
                                batches, labels, key)
    np.asarray(losses)

    # NB: time via a value fetch — block_until_ready alone has been
    # observed not to block on experimental remote TPU backends
    t0 = time.perf_counter()
    params, losses = epoch_fn(params, feats, neighbors, degrees,
                              batches, labels, key)
    np.asarray(losses)
    dt = (time.perf_counter() - t0) / n_steps

    edges = edges_per_batch(batch_size, mcfg.num_layers, fanout)
    eps = edges / dt
    print(json.dumps({
        "metric": "edges_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / REFERENCE_EDGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
