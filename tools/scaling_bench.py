"""Scaling harness: edges/s for the distributed halo step at 1..N devices.

BASELINE.json config 5: synthetic power-law graph, edge-partitioned over
N devices, all-to-all boundary exchange.  On a CPU host this measures
*relative* scaling on the virtual device mesh (absolute numbers are not
TPU numbers); on a multi-chip TPU slice the same script measures real
edges/s/chip and scaling efficiency.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py --nodes 100000 --edges 1000000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--feat_dim", type=int, default=602)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--b_loc", type=int, default=256,
                    help="batch per device (weak scaling)")
    ap.add_argument("--fanout", type=int, default=10)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--pipeline", type=str, default="halo",
                    choices=["halo", "cached"],
                    help="halo = edge-partitioned features + all_to_all "
                         "exchange; cached = sharded leaf-cached epoch "
                         "(row-sharded layer-1 table, all_gather fwd / "
                         "psum_scatter bwd)")
    ap.add_argument("--out", type=str, default=None,
                    help="write the full results list as JSON to this path")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (the sitecustomize "
                         "pins jax_platforms to the TPU tunnel, overriding "
                         "JAX_PLATFORMS; this forces it back)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.parallel.halo import shard_features
    from graphsage_tpu.train.dense import edges_per_batch
    from graphsage_tpu.train.distributed import (
        build_dist_batch,
        dist_batch_to_device,
        make_dist_sup_step,
    )

    ds = synthetic_power_law(args.nodes, args.edges,
                             num_feats=args.feat_dim, seed=0)
    mcfg = GraphSageConfig(num_layers=2, input_size=args.feat_dim,
                           out_size=args.hidden)
    key = jax.random.PRNGKey(0)
    base_params = {
        "sage": init_graphsage(key, mcfg),
        "clf": init_classifier(key, args.hidden, ds.num_classes),
    }
    rng = np.random.RandomState(0)

    results = []
    for n_dev in [int(x) for x in args.devices.split(",")]:
        if n_dev > len(jax.devices()):
            break
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]),
                    axis_names=("data",))
        params = jax.device_put(base_params, NamedSharding(mesh, P()))

        if args.pipeline == "cached":
            from graphsage_tpu.train.cached_dist import (
                build_epoch_stack,
                make_cached_dist_epoch,
                pad_node_tables,
                place_epoch_inputs,
            )

            pad = ds.graph.to_padded_sampled(32, np.random.RandomState(0))
            feats, neighbors, degrees = pad_node_tables(
                ds.features, pad.neighbors, pad.degrees, n_dev)
            epoch_fn = make_cached_dist_epoch(mcfg, mesh,
                                              fanout=args.fanout, lr=0.1)
            b = n_dev * args.b_loc
            batches, labs, masks = build_epoch_stack(
                ds.train_nodes, ds.labels, n_dev, b, rng)
            t_steps = min(args.steps, batches.shape[0])
            ep_args = place_epoch_inputs(
                mesh, feats, neighbors, degrees, batches[:t_steps],
                labs[:t_steps], masks[:t_steps])
            key = jax.random.PRNGKey(0)
            params, losses = epoch_fn(params, *ep_args, key)  # compile
            jax.block_until_ready(losses)
            t0 = time.perf_counter()
            reps = 3
            for r in range(reps):
                params, losses = epoch_fn(
                    params, *ep_args, jax.random.PRNGKey(r + 1))
            jax.block_until_ready(losses)
            dt = (time.perf_counter() - t0) / (reps * t_steps)
            edges = edges_per_batch(args.b_loc, 2, args.fanout) * n_dev
            eps = edges / dt
            results.append({"devices": n_dev, "edges_per_sec": round(eps),
                            "step_ms": round(dt * 1000, 2)})
            base = results[0]["edges_per_sec"] * n_dev
            results[-1]["scaling_efficiency"] = round(
                eps / base if base else 0, 3)
            print(json.dumps(results[-1]))
            continue
        feats_sh = jax.device_put(
            jnp.asarray(shard_features(ds.features, n_dev)),
            NamedSharding(mesh, P("data", None)))
        step = make_dist_sup_step(mcfg, mesh, lr=0.1)

        def make_batch(it):
            b = ds.train_nodes[rng.choice(len(ds.train_nodes),
                                          (n_dev, args.b_loc))]
            db = build_dist_batch(ds.graph, ds.labels, b, 2, args.fanout,
                                  seed=it, cap=None)
            return dist_batch_to_device(db, mesh)

        # warmup/compile (cap buckets; use a couple of batches)
        for it in range(2):
            params, loss = step(params, feats_sh, *make_batch(it))
        jax.block_until_ready(loss)

        # pre-build batches so host time is excluded from the device rate
        batches = [make_batch(100 + it) for it in range(args.steps)]
        t0 = time.perf_counter()
        for a in batches:
            params, loss = step(params, feats_sh, *a)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps

        edges = edges_per_batch(args.b_loc, 2, args.fanout) * n_dev
        eps = edges / dt
        results.append({"devices": n_dev, "edges_per_sec": round(eps),
                        "step_ms": round(dt * 1000, 2)})
        base = results[0]["edges_per_sec"] * n_dev
        eff = eps / base if base else 0
        results[-1]["scaling_efficiency"] = round(eff, 3)
        print(json.dumps(results[-1]))

    if args.out:
        payload = {
            "pipeline": args.pipeline,
            "workload": {"nodes": args.nodes, "edges": args.edges,
                         "feat_dim": args.feat_dim, "hidden": args.hidden,
                         "b_loc": args.b_loc, "fanout": args.fanout,
                         "steps": args.steps},
            "backend": jax.devices()[0].platform,
            "note": ("virtual CPU mesh: relative weak-scaling only; "
                     "absolute rates are not TPU rates"
                     if jax.devices()[0].platform == "cpu" else
                     "real device mesh"),
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
