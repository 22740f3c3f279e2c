"""Halo-pipeline overhead measurement (VERDICT r04 weak #7 / item 8).

Two modes:

``chip`` (default; run on the TPU): time the distributed supervised step
on a **1-device mesh** against an equivalent single-device step built from
the SAME host-sampled frontiers (`DistBatch.x0_ids` replay — the parity
construction tests/test_distributed.py uses).  On one device the halo plan
degenerates to all-local, so the measured delta is the pure cost of the
exchange machinery: the two-phase all_to_all pair (parallel/halo.py),
request-table assembly, and address translation — the overhead the
edge-partitioned pipeline carries per step *before* any scaling benefit.

``virtual`` (CPU mesh): relative weak scaling of the same dist step at
1/2/4/8 virtual devices at round-5 HEAD (refreshing SCALING_r02.json's
measurement; relative numbers only — CPU mesh).  Invoke with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/halo_overhead.py virtual

Writes HALO_OVERHEAD_r05.json (rows merged across modes/runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 10


def _chain_timed(first_args_fn, step_fn, reps=REPS):
    """Time ``reps`` chained step calls (params threaded through, ONE loss
    fetch at the end — tunnel RTT amortized across the chain)."""
    params, args = first_args_fn()
    params, loss = step_fn(params, *args)   # compile + warm
    np.asarray(loss)
    params0, args = first_args_fn()
    t0 = time.perf_counter()
    p = params0
    loss = None
    for _ in range(reps):
        p, loss = step_fn(p, *args)
    np.asarray(loss)
    return (time.perf_counter() - t0) / reps * 1e3


def run_chip(b_loc=4096, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.losses import supervised_nll
    from graphsage_tpu.models import (
        GraphSageConfig,
        classifier_apply,
        init_graphsage,
    )
    from graphsage_tpu.models.graphsage import Frontier, graphsage_apply
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.train.dense import cast_compute, edges_per_batch
    from graphsage_tpu.train.distributed import (
        build_dist_batch,
        dist_batch_to_device,
        make_dist_sup_step,
    )
    from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update

    ds = synthetic_power_law(100_000, 1_000_000, num_feats=602,
                             num_classes=16, seed=0)
    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=128, compute_dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(824))
    params = {"sage": init_graphsage(k1, mcfg),
              "clf": init_classifier(k2, 128, ds.num_classes)}
    rng = np.random.RandomState(7)
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes),
                                      (1, b_loc))]
    db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                          fanout=10, seed=99)

    # --- distributed step on the 1-device mesh
    dist_step = make_dist_sup_step(mcfg, mesh)
    feats_sh = jax.device_put(jnp.asarray(ds.features, dtype=jnp.dtype(
        dtype)), NamedSharding(mesh, P("data", None)))
    repl = NamedSharding(mesh, P())

    def dist_args():
        p = jax.device_put(jax.device_get(params), repl)
        return p, (feats_sh,) + dist_batch_to_device(db, mesh)

    dist_ms = _chain_timed(dist_args, dist_step)

    # --- single-device oracle from the same frontiers (x0_ids replay)
    feats = jnp.asarray(ds.features, dtype=jnp.dtype(dtype))
    x0_ids = jnp.asarray(db.x0_ids[0])
    frontiers = [Frontier(idx=jnp.asarray(f.idx[0]),
                          mask=jnp.asarray(f.mask[0]),
                          self_idx=jnp.asarray(f.self_idx[0]))
                 for f in db.frontiers]
    labels = jnp.asarray(db.labels[0])
    row_mask = jnp.asarray(db.row_mask[0])

    @jax.jit
    def local_step(p, feats, x0_ids, labels, row_mask):
        def loss_fn(pp):
            pp = cast_compute(pp, mcfg)
            x0 = jnp.take(feats, x0_ids, axis=0)
            embs = graphsage_apply(pp["sage"], mcfg, x0, frontiers)
            logp = classifier_apply(pp["clf"], embs)
            return supervised_nll(logp, labels, row_mask)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = {k: clip_by_global_norm(g, 5.0) for k, g in grads.items()}
        return sgd_update(p, grads, 0.7), loss

    def local_args():
        import jax as _j
        p = _j.tree_util.tree_map(jnp.asarray, jax.device_get(params))
        return p, (feats, x0_ids, labels, row_mask)

    local_ms = _chain_timed(local_args, local_step)

    edges = edges_per_batch(b_loc, mcfg.num_layers, 10)
    row = {
        "mode": "chip_mesh1_overhead",
        "device": jax.devices()[0].device_kind,
        "b_loc": b_loc, "dtype": dtype,
        "dist_step_ms": round(dist_ms, 3),
        "local_oracle_ms": round(local_ms, 3),
        "halo_overhead_ms": round(dist_ms - local_ms, 3),
        "halo_overhead_pct": round((dist_ms - local_ms) / local_ms * 100,
                                   1),
        "dist_edges_per_sec": round(edges / (dist_ms / 1e3), 1),
        "note": ("1-device mesh: the halo plan is all-local, so the delta "
                 "is pure exchange/assembly cost (two-phase all_to_all + "
                 "request tables + address translation) at identical "
                 "frontiers (x0_ids replay oracle)"),
    }
    return [row]


def run_virtual():
    import jax

    # the axon sitecustomize force-registers the remote TPU backend and
    # overrides JAX_PLATFORMS=cpu; the in-Python config update wins
    # (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    if len(devs) < 8:
        raise SystemExit("run with XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=8 JAX_PLATFORMS=cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.dense import edges_per_batch
    from graphsage_tpu.train.distributed import (
        build_dist_batch,
        dist_batch_to_device,
        make_dist_sup_step,
    )
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.parallel.halo import shard_features

    ds = synthetic_power_law(40_000, 400_000, num_feats=128,
                             num_classes=8, seed=0)
    b_loc = 512
    rows = []
    base = None
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devs[:n_dev]), axis_names=("data",))
        mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                               out_size=64)
        k1, k2 = jax.random.split(jax.random.PRNGKey(824))
        params = {"sage": init_graphsage(k1, mcfg),
                  "clf": init_classifier(k2, 64, ds.num_classes)}
        rng = np.random.RandomState(7)
        batch = ds.train_nodes[rng.choice(len(ds.train_nodes),
                                          (n_dev, b_loc))]
        db = build_dist_batch(ds.graph, ds.labels, batch, mcfg.num_layers,
                              fanout=10, seed=99)
        step = make_dist_sup_step(mcfg, mesh)
        feats_sh = jax.device_put(
            jnp.asarray(shard_features(ds.features, n_dev)),
            NamedSharding(mesh, P("data", None)))
        repl = NamedSharding(mesh, P())

        def args():
            p = jax.device_put(jax.device_get(params), repl)
            return p, (feats_sh,) + dist_batch_to_device(db, mesh)

        ms = _chain_timed(args, step)
        edges = edges_per_batch(n_dev * b_loc, mcfg.num_layers, 10)
        eps = edges / (ms / 1e3)
        if base is None:
            base = eps
        rows.append({"mode": "virtual_weak_scaling", "n_dev": n_dev,
                     "b_loc": b_loc, "step_ms": round(ms, 3),
                     "edges_per_sec": round(eps, 1),
                     "efficiency_vs_1dev": round(eps / (base * n_dev), 3),
                     "host_cpus": os.cpu_count()})
        print("#", json.dumps(rows[-1]), file=sys.stderr)
    rows.append({
        "mode": "virtual_weak_scaling_note",
        "note": (f"{os.cpu_count()}-core host: total compute grows with "
                 "n_dev but the virtual devices share the physical cores, "
                 "so efficiency beyond n_dev=cpus measures host-core "
                 "contention, NOT the collective design.  The virtual "
                 "mesh validates correctness and that the per-step "
                 "collective payload stays flat (2·N·H bytes regardless "
                 "of P, parallel/halo.py); absolute scaling requires "
                 "real chips.")})
    return rows


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    rows = run_virtual() if mode == "virtual" else run_chip()
    for r in rows:
        print("#", json.dumps(r), file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "HALO_OVERHEAD_r05.json")
    merged = {"rows": rows}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            have = {(r["mode"], r.get("n_dev")) for r in rows}
            merged["rows"] = rows + [
                r for r in old.get("rows", [])
                if (r.get("mode"), r.get("n_dev")) not in have]
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
