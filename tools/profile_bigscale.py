"""Step anatomy at 1M-node scale (companion to PROFILE_CACHED.json which
is the 100k-node anatomy).  Times, on the real chip:

- the epoch cache refresh alone (per epoch);
- the scanned train step with the refresh HOISTED OUT (step-only cost);
- the layer-1 full-table GEMM alone;
- the narrow [H]-row gather and its backward scatter at 1M table rows.

All tables are passed as jit ARGUMENTS (closing over 2.4 GB arrays embeds
them as HLO constants and stalls the remote compiler).

Run on the TPU:  python tools/profile_bigscale.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

BATCH = 65536
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from bench import _setup
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.cached import (
        make_cached_sup_step,
        refresh_leaf_cache,
    )

    from bigscale_bench import _patch_setup_devfeats
    setup_devfeats = _patch_setup_devfeats()

    t0 = time.time()
    ds = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    print(f"# generated in {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)

    (mcfg, params, feats, neighbors, degrees, batches,
     labels) = setup_devfeats(ds, pad, "bfloat16", BATCH, STEPS, 128)
    results = {"workload": "powerlaw 1M nodes, D=602, H=128, fanout 10, "
                           "table width 32, bf16 tables",
               "batch": BATCH}

    def timed(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
        return (time.perf_counter() - t0) / reps * 1000

    def report(name, ms):
        results[name] = round(ms, 2)
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr, flush=True)

    # 1. refresh alone (fetch a device-side scalar — a [1M] counts fetch
    # is 4 MB over the tunnel and would swamp the timing on slow days)
    def refresh_probe(k, f, nb, dg):
        cf, cc = refresh_leaf_cache(k, f, nb, dg, 10, agg="MEAN")
        return cf, cc, jnp.sum(cc)

    refresh = jax.jit(refresh_probe)
    report("refresh_ms", timed(refresh, jax.random.PRNGKey(0), feats,
                               neighbors, degrees))
    cf, cc, _ = refresh(jax.random.PRNGKey(1), feats, neighbors, degrees)

    # 2. scanned steps with the refresh hoisted out
    step = make_cached_sup_step(mcfg, fanout=10)

    def scan_steps(p0, key, feats, cf, cc, neighbors, degrees, batches,
                   labels):
        def body(carry, xs):
            p, k = carry
            b, lab = xs
            k, sub = jax.random.split(k)
            p, loss = step(p, feats, cf, cc, neighbors, degrees, b, lab,
                           sub)
            return (p, k), loss

        (p, _), losses = jax.lax.scan(body, (p0, key), (batches, labels))
        return p, losses

    f = jax.jit(scan_steps)
    dt = timed(f, params, jax.random.PRNGKey(5), feats, cf, cc, neighbors,
               degrees, batches, labels, reps=1)
    report("steponly_ms_per_step", dt / STEPS)

    # 2b. anatomy variants (round 4): forward-only and stop-grad-h1-table
    # scans isolate where the 1M step's time goes — the same decomposition
    # PROFILE_CACHED.json runs at 100k (fwd / l1-backward / rest).
    from graphsage_tpu.models import classifier_apply
    from graphsage_tpu.losses import supervised_nll
    from graphsage_tpu.train.cached import cached_forward
    from graphsage_tpu.train.dense import cast_compute
    from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update

    def fwd_only_scan(p0, key, feats, cf, cc, neighbors, degrees, batches,
                      labels):
        def body(carry, xs):
            acc, k = carry
            b, lab = xs
            k, sub = jax.random.split(k)
            embs = cached_forward(p0, mcfg, feats, cf, cc, neighbors,
                                  degrees, b, sub, 10)
            logp = classifier_apply(cast_compute(p0["clf"], mcfg), embs)
            loss = supervised_nll(logp, lab,
                                  jnp.ones(b.shape[0], jnp.float32))
            return (acc + loss, k), loss

        (_, _), losses = jax.lax.scan(body, (jnp.float32(0), key),
                                      (batches, labels))
        return losses

    dt = timed(jax.jit(fwd_only_scan), params, jax.random.PRNGKey(5),
               feats, cf, cc, neighbors, degrees, batches, labels, reps=1)
    report("forward_only_ms_per_step", dt / STEPS)

    def stopgrad_scan(p0, key, feats, cf, cc, neighbors, degrees, batches,
                      labels):
        # stop the gradient at the constant leaf tables' layer-1 output:
        # removes the d(h1_table) scatter + dW1 GEMM from the backward
        feats_s = jax.lax.stop_gradient(feats)

        def body(carry, xs):
            p, k = carry
            b, lab = xs
            k, sub = jax.random.split(k)

            def loss_fn(pp):
                frozen = {"sage": {**pp["sage"],
                                   "layers": [jax.lax.stop_gradient(
                                       pp["sage"]["layers"][0])]
                                   + list(pp["sage"]["layers"][1:])},
                          "clf": pp["clf"]}
                embs = cached_forward(frozen, mcfg, feats_s, cf, cc,
                                      neighbors, degrees, b, sub, 10)
                logp = classifier_apply(cast_compute(pp["clf"], mcfg),
                                        embs)
                return supervised_nll(logp, lab,
                                      jnp.ones(b.shape[0], jnp.float32))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            grads = {kk: clip_by_global_norm(g, 5.0)
                     for kk, g in grads.items()}
            return (sgd_update(p, grads, 0.7), k), loss

        (p, _), losses = jax.lax.scan(body, (p0, key), (batches, labels))
        return p, losses

    dt = timed(jax.jit(stopgrad_scan), params, jax.random.PRNGKey(5),
               feats, cf, cc, neighbors, degrees, batches, labels, reps=1)
    report("stopgrad_w1_ms_per_step", dt / STEPS)

    # NB: isolated per-op reps at [1M, D] shapes are NOT measured here —
    # any rep-loop carry at that shape is a ≥256 MB buffer whose fetch
    # over the remote tunnel dominates the timing (measurement artifact).
    # PROFILE_CACHED.json holds the per-op rates at fetch-safe shapes.
    results["derived"] = {
        "refresh_amortized_ms_per_step_T20": round(
            results["refresh_ms"] / STEPS, 2),
        "total_ms_per_step": round(
            results["refresh_ms"] / STEPS
            + results["steponly_ms_per_step"], 2),
        "refresh_gather_GBps": round(
            1e7 * 2 * feats.shape[1] / (results["refresh_ms"] / 1e3) / 1e9,
            1),
    }

    print(json.dumps(results, indent=1))
    with open("PROFILE_BIGSCALE.json", "w") as fp:
        json.dump(results, fp, indent=1)


if __name__ == "__main__":
    main()
