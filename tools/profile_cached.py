"""Decompose the cached-pipeline step time on the real chip.

Measurement methodology: on the experimental remote TPU backend,
``block_until_ready`` does not reliably block and per-call timing measures
dispatch, not execution.  Every number here is therefore taken from ONE
jit'd program that runs the op ``ITERS`` times inside a ``lax.scan`` with a
data dependency through the carry (so XLA cannot hoist or dead-code the
body), fetched to host with ``np.asarray``, and divided by ``ITERS``.

Times, at the headline bench shape (100k nodes / 602 feats / H=128 /
B=32768 / fanout 10 / table width 32): the full train step, sampling only,
forward only, fwd+bwd, the layer-1 full-table GEMM, and isolated
gather / scatter-add / sort+segment-sum at the step's exact shapes and
dtypes.  Writes PROFILE_CACHED.json.  Run on the TPU (no JAX_PLATFORMS
override).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig, init_graphsage
from graphsage_tpu.models.layers import init_classifier, sage_layer_apply
from graphsage_tpu.sampler.device import sample_frontiers_dense
from graphsage_tpu.train.cached import (cached_forward, make_cached_sup_step,
                                        refresh_leaf_cache)

B, FANOUT, HIDDEN, ITERS = 32768, 10, 128, 30


def dev_time(program, *args):
    """Median-of-3 wall time of one fetched call to a pre-jitted program."""
    out = program(*args)                      # compile + warmup
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = program(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / ITERS * 1000       # ms per iteration


def main():
    ds = synthetic_power_law(100_000, 1_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    feats = jnp.asarray(ds.features)
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, ds.num_nodes, size=B).astype(np.int32))
    labels = jnp.take(jnp.asarray(ds.labels.astype(np.int32)), batch)
    keys = jax.random.split(jax.random.PRNGKey(7), ITERS)

    rows = []

    def rec(name, ms, detail=""):
        rows.append({"op": name, "ms": round(ms, 3), "detail": detail})
        print(f"{name:44s} {ms:8.3f} ms  {detail}", file=sys.stderr)

    for dtype in ("float32", "bfloat16"):
        mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                               out_size=HIDDEN, compute_dtype=dtype)
        k1, k2 = jax.random.split(jax.random.PRNGKey(824))
        params = {"sage": init_graphsage(k1, mcfg),
                  "clf": init_classifier(k2, HIDDEN, ds.num_classes)}

        @jax.jit
        def refresh_many(ks, f, nb, dg):
            def body(c, k):
                mf, cc = refresh_leaf_cache(k, f, nb, dg, FANOUT)
                return c + mf[0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), ks)[0]

        rec(f"refresh_leaf_cache_{dtype}",
            dev_time(refresh_many, keys, feats, neighbors, degrees))

        mean_feats, cache_count = jax.jit(
            lambda k, f, nb, dg: refresh_leaf_cache(k, f, nb, dg, FANOUT)
        )(keys[0], feats, neighbors, degrees)

        step = make_cached_sup_step(mcfg, fanout=FANOUT)

        @jax.jit
        def step_many(p, f, mf, cc, nb, dg, b, lab, ks):
            def body(p, k):
                p, loss = step(p, f, mf, cc, nb, dg, b, lab, k)
                return p, loss
            return jax.lax.scan(body, p, ks)
        rec(f"full_step_{dtype}",
            dev_time(step_many, params, feats, mean_feats, cache_count,
                     neighbors, degrees, batch, labels, keys))

        @jax.jit
        def fwd_many(p, f, mf, cc, nb, dg, b, ks):
            def body(c, k):
                embs = cached_forward(p, mcfg, f, mf, cc, nb, dg, b, k,
                                      FANOUT)
                return c + jnp.sum(embs).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), ks)[0]
        rec(f"forward_only_{dtype}",
            dev_time(fwd_many, params, feats, mean_feats, cache_count,
                     neighbors, degrees, batch, keys))

        @jax.jit
        def fwd_bwd_many(p, f, mf, cc, nb, dg, b, ks):
            def loss_fn(p_, k):
                embs = cached_forward(p_, mcfg, f, mf, cc, nb, dg, b, k,
                                      FANOUT)
                return jnp.sum(embs.astype(jnp.float32))

            def body(c, k):
                loss, grads = jax.value_and_grad(loss_fn)(p, k)
                gsum = sum(jnp.sum(x).astype(jnp.float32)
                           for x in jax.tree.leaves(grads))
                return c + loss + gsum, None
            return jax.lax.scan(body, jnp.float32(0), ks)[0]
        rec(f"fwd_bwd_{dtype}",
            dev_time(fwd_bwd_many, params, feats, mean_feats, cache_count,
                     neighbors, degrees, batch, keys))

        # layer-1 full-table GEMM alone (the pretransform the cache buys)
        w1 = params["sage"]["layers"][0]

        @jax.jit
        def gemm_many(w, f, mf, ks):
            cd = jnp.dtype(mcfg.compute_dtype)
            f, mf = f.astype(cd), mf.astype(cd)

            def body(c, k):
                h = sage_layer_apply(jax.tree.map(lambda x: x.astype(cd), w),
                                     f, mf, gcn=False)
                return c + jnp.sum(h).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), ks)[0]
        rec(f"layer1_fulltable_gemm_{dtype}",
            dev_time(gemm_many, w1, feats, mean_feats, keys))

    @jax.jit
    def samp_many(nb, dg, b, ks):
        def body(c, k):
            ids, fr = sample_frontiers_dense(k, nb, dg, b, num_layers=1,
                                             fanout=FANOUT)
            return c + jnp.sum(ids) + jnp.sum(fr[0].mask).astype(jnp.int32), None
        return jax.lax.scan(body, jnp.int32(0), ks)[0]
    rec("sampling_L-1_hops",
        dev_time(samp_many, neighbors, degrees, batch, keys))

    # isolated data movement at the step's shapes; ids vary per iteration
    # (rolled) so the scan body is not loop-invariant
    m = B * (FANOUT + 1)
    ids = jnp.asarray(rng.randint(0, ds.num_nodes, size=m).astype(np.int32))
    n = ds.num_nodes
    for dt in (jnp.float32, jnp.bfloat16):
        table = jnp.zeros((n, HIDDEN), dt)
        g = jnp.ones((m, HIDDEN), dt)

        @jax.jit
        def gather_many(t, i):
            def body(c, off):
                out = jnp.take(t, (i + off) % n, axis=0)
                return c + jnp.sum(out).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(ITERS, dtype=jnp.int32))[0]
        ms = dev_time(gather_many, table, ids)
        rec(f"gather_{m}x{HIDDEN}_{dt.__name__}", ms,
            f"{m/ms*1000/1e6:.0f}M rows/s")

        @jax.jit
        def scatter_many(t, i, v):
            def body(t_, off):
                return t_.at[(i + off) % n].add(v), None
            return jax.lax.scan(body, t,
                                jnp.arange(ITERS, dtype=jnp.int32))[0]
        ms = dev_time(scatter_many, table, ids, g)
        rec(f"scatter_add_{m}x{HIDDEN}_{dt.__name__}", ms,
            f"{m/ms*1000/1e6:.0f}M rows/s")

        @jax.jit
        def segsum_many(t, i, v):
            def body(t_, off):
                ii = (i + off) % n
                order = jnp.argsort(ii)
                sv = jnp.take(v, order, axis=0)
                seg = jax.ops.segment_sum(sv, jnp.take(ii, order),
                                          num_segments=n)
                return t_ + seg, None
            return jax.lax.scan(body, t,
                                jnp.arange(ITERS, dtype=jnp.int32))[0]
        ms = dev_time(segsum_many, table, ids, g)
        rec(f"sort_segsum_{m}x{HIDDEN}_{dt.__name__}", ms,
            f"{m/ms*1000/1e6:.0f}M rows/s")

    with open("PROFILE_CACHED.json", "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "methodology": "scan-chained x30 inside one jit, fetched",
                   "rows": rows}, f, indent=1)
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
