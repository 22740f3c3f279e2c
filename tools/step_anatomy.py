"""Per-slice anatomy of the cached supervised step (VERDICT r04 item 4 /
weak #3: the headline's non-scatter ~38% had no per-slice accounting).

Methodology: each slice runs as a `lax.scan` of REPS iterations inside ONE
jitted program (per-iteration PRNG fold-in + a loop-carried checksum, so
XLA can neither hoist the slice out of the loop nor skip it), timed with a
single device fetch — the tunnel's ~25 ms dispatch+fetch RTT is paid once
per measurement and divided by REPS (the measured `timing_floor_ms` null
slice reports the residual).  All large tables are passed as jit
ARGUMENTS, never closed over: a closed-over device array is embedded in
the lowered computation, and shipping a 1.2 GB constant to the remote
compiler wedges the compile (observed live, twice).  Slices:

  timing_floor   null body — the per-measurement overhead every number
                 below carries additively
  sampling       in-jit frontier draw (sampler/device.py) at batch shape
  l1_gemm        layer-1 full-table GEMM pair (sage_layer_apply over all N)
  h1_gather      + the [M, H] narrow-row gather of the frontier (delta)
  fwd            full cached_forward (adds upper layers + clf head)
  fwd_bwd        + value_and_grad (adds the backward: dW GEMMs + the M-row
                 dH1 scatter-add — the measured binding op)
  step           + clip/SGD (the complete training step)
  scatter_bound  isolated M-row [H] scatter-add into [N, H] at the exact
                 step shapes (grad-of-gather), the roofline denominator

Workloads: 100k (the bench headline graph) and 1m (BASELINE config-5).
Writes/merges PROFILE_ANATOMY_r05.json.  Run on the TPU:
    python tools/step_anatomy.py [100k|1m|tiny] [batch ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 20


def _scan_timed(make_body, arrays=(), reps=REPS):
    """make_body(it, carry, *arrays) -> new_carry (f32 scalar folding in
    the slice's result).  ``arrays`` are jit ARGUMENTS (see module
    docstring).  Returns (ms_per_rep, total_s)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(c0, *arrs):
        def body(c, it):
            return make_body(it, c, *arrs), ()

        c, _ = jax.lax.scan(body, c0, jnp.arange(reps))
        return c

    c = prog(jnp.float32(0.0), *arrays)
    np.asarray(c)  # compile + warm
    t0 = time.perf_counter()
    c = prog(jnp.float32(1e-9), *arrays)
    np.asarray(c)
    dt = time.perf_counter() - t0
    return dt / reps * 1e3, dt


def anatomy(ds, pad, batch, dtype="bfloat16", hidden=128, fanout=10):
    import jax
    import jax.numpy as jnp

    import bench
    from graphsage_tpu.models.layers import sage_layer_apply
    from graphsage_tpu.sampler.device import sample_frontiers_dense
    from graphsage_tpu.train.cached import (
        cached_forward,
        make_cached_sup_step,
        refresh_leaf_cache,
    )
    from graphsage_tpu.train.dense import cast_compute
    from graphsage_tpu.losses import supervised_nll
    from graphsage_tpu.models import classifier_apply

    (mcfg, params, feats, neighbors, degrees, batches,
     labels) = bench._setup(ds, pad, dtype, batch, 1, hidden)
    batch_ids = batches[0]
    lab = labels[0]
    key0 = jax.random.PRNGKey(824)

    @jax.jit
    def _refresh(k, feats, neighbors, degrees):
        return refresh_leaf_cache(k, feats, neighbors, degrees, fanout)

    cache_feats, cache_count = _refresh(key0, feats, neighbors, degrees)
    jax.block_until_ready(cache_count)

    n = feats.shape[0]
    res = {"batch": batch, "nodes": n,
           "frontier_rows": batch * (fanout + 1), "dtype": dtype}

    def rec(name, val):
        res[name] = round(val, 3)
        print(f"# slice {name}: {res[name]}", file=sys.stderr)

    # --- null slice: per-measurement floor
    rec("timing_floor_ms", _scan_timed(lambda it, c: c + it.astype(
        jnp.float32) * 1e-20)[0])

    # --- sampling
    def s_sampling(it, c, neighbors, degrees, batch_ids):
        k = jax.random.fold_in(key0, it)
        ids, frontiers = sample_frontiers_dense(
            k, neighbors, degrees, batch_ids,
            num_layers=mcfg.num_layers - 1, fanout=fanout)
        return c + jnp.sum(ids).astype(jnp.float32) * 1e-20 + \
            jnp.sum(frontiers[0].mask).astype(jnp.float32) * 1e-20

    rec("sampling_ms", _scan_timed(s_sampling,
                                   (neighbors, degrees, batch_ids))[0])

    # --- layer-1 full-table GEMM pair (the cast to compute dtype happens
    # once outside, as in the real step where feats are stored in bf16)
    w1 = cast_compute(params["sage"]["layers"][0], mcfg)
    cfeats = cast_compute(feats, mcfg)
    ccache = cast_compute(cache_feats, mcfg)

    def s_l1(it, c, w1, cfeats, ccache):
        # perturb in the WEIGHT's dtype: w1 is already cast to bf16, and
        # bf16 + f32-carry promotes the whole GEMM to f32 (upcasting the
        # slice the real step runs in bf16) — cast the epsilon, not x
        w = jax.tree_util.tree_map(
            lambda x: x + (c * 1e-30).astype(x.dtype), w1)
        t = sage_layer_apply(w, cfeats, ccache, gcn=False)
        return c + jnp.sum(t.astype(jnp.float32)) * 1e-20

    rec("l1_gemm_ms", _scan_timed(s_l1, (w1, cfeats, ccache))[0])

    # --- + frontier gather
    ids_static, _ = jax.jit(lambda k, nb, dg, b: sample_frontiers_dense(
        k, nb, dg, b, num_layers=mcfg.num_layers - 1, fanout=fanout))(
            key0, neighbors, degrees, batch_ids)
    jax.block_until_ready(ids_static)

    def s_l1_gather(it, c, w1, cfeats, ccache, ids):
        w = jax.tree_util.tree_map(
            lambda x: x + (c * 1e-30).astype(x.dtype), w1)
        t = sage_layer_apply(w, cfeats, ccache, gcn=False)
        g = jnp.take(t, ids, axis=0)
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-20

    d = _scan_timed(s_l1_gather, (w1, cfeats, ccache, ids_static))[0]
    rec("l1_gemm_plus_gather_ms", d)
    rec("h1_gather_ms", d - res["l1_gemm_ms"])

    def peps(p, c):
        return jax.tree_util.tree_map(lambda x: x * (1.0 + c * 1e-30), p)

    # --- full forward (+ clf head + nll, no grad)
    def s_fwd(it, c, params, feats, cache_feats, cache_count, neighbors,
              degrees, batch_ids, lab):
        k = jax.random.fold_in(key0, it)
        p = peps(params, c)
        embs = cached_forward(p, mcfg, feats, cache_feats, cache_count,
                              neighbors, degrees, batch_ids, k, fanout)
        logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
        loss = supervised_nll(logp, lab,
                              jnp.ones(batch_ids.shape[0], jnp.float32))
        return c + loss.astype(jnp.float32) * 1e-20

    fwd_args = (params, feats, cache_feats, cache_count, neighbors,
                degrees, batch_ids, lab)
    rec("fwd_ms", _scan_timed(s_fwd, fwd_args)[0])

    # --- forward + backward
    def s_fwd_bwd(it, c, params, feats, cache_feats, cache_count,
                  neighbors, degrees, batch_ids, lab):
        k = jax.random.fold_in(key0, it)
        p = peps(params, c)

        def loss_of(pp):
            embs = cached_forward(pp, mcfg, feats, cache_feats,
                                  cache_count, neighbors, degrees,
                                  batch_ids, k, fanout)
            logp = classifier_apply(cast_compute(pp["clf"], mcfg), embs)
            return supervised_nll(
                logp, lab, jnp.ones(batch_ids.shape[0], jnp.float32))

        loss, grads = jax.value_and_grad(loss_of)(p)
        lsum = sum(jnp.sum(g.astype(jnp.float32)) * 1e-20
                   for g in jax.tree_util.tree_leaves(grads))
        return c + loss.astype(jnp.float32) * 1e-20 + lsum

    rec("fwd_bwd_ms", _scan_timed(s_fwd_bwd, fwd_args)[0])

    # --- complete step (matches the epoch program body: carry = params)
    step = make_cached_sup_step(mcfg, fanout=fanout)

    @jax.jit
    def full_steps(p0, feats, cache_feats, cache_count, neighbors,
                   degrees, batch_ids, lab):
        def body(p, it):
            k = jax.random.fold_in(key0, it)
            p2, loss = step(p, feats, cache_feats, cache_count, neighbors,
                            degrees, batch_ids, lab, k)
            return p2, loss

        _, losses = jax.lax.scan(body, p0, jnp.arange(REPS))
        return losses

    np.asarray(full_steps(params, *fwd_args[1:]))
    t0 = time.perf_counter()
    np.asarray(full_steps(params, *fwd_args[1:]))
    rec("step_ms", (time.perf_counter() - t0) / REPS * 1e3)

    # --- isolated scatter bound at the exact shapes: d(table) of an
    # M-row gather is an M-row [H] scatter-add into [N, H]
    table = jnp.zeros((n, hidden), dtype=jnp.dtype(dtype))
    dout = jnp.ones((ids_static.shape[0], hidden), dtype=jnp.dtype(dtype))

    def s_scatter(it, c, table, dout, ids):
        # dout must vary with the carry: the gradient of a LINEAR
        # function of the table does not depend on the table, so
        # perturbing only the table leaves the scatter loop-invariant and
        # XLA hoists it out of the scan (observed: a 378M rows/s
        # "scatter" that was one hoisted scatter + 19 no-op iterations)
        d2 = dout * (1.0 + c)
        g = jax.grad(lambda tt: jnp.sum(
            jnp.take(tt, ids, axis=0).astype(jnp.float32)
            * d2.astype(jnp.float32)))(table)
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-20

    rec("scatter_bound_ms",
        _scan_timed(s_scatter, (table, dout, ids_static))[0])
    res["scatter_rows_per_sec"] = round(
        ids_static.shape[0] / (res["scatter_bound_ms"] / 1e3), 1)

    # --- isolated gather bound at the exact shapes (M narrow [H] rows
    # from the [N, H] table).  The index shift is data-dependently zero:
    # XLA cannot fold it, so the gather re-runs every iteration, but the
    # gathered rows are identical to ids_static's.
    def s_gather(it, c, table, ids):
        shift = jnp.minimum(jnp.abs(c).astype(jnp.int32), 0)
        g = jnp.take(table, ids + shift, axis=0)
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-20

    rec("gather_bound_ms", _scan_timed(s_gather, (table, ids_static))[0])
    res["gather_rows_per_sec"] = round(
        ids_static.shape[0] / (res["gather_bound_ms"] / 1e3), 1)

    # derived slices
    # every measured slice carries +floor additively; fwd − l1pg − samp
    # nets to −1 floor (one +f from fwd, two −f from the subtrahends), so
    # add one back — without this the derived slice is understated by a
    # full floor (the source of the negative values in earlier captures)
    rec("upper_plus_head_fwd_ms",
        res["fwd_ms"] - res["l1_gemm_plus_gather_ms"] - res["sampling_ms"]
        + res["timing_floor_ms"])
    rec("backward_ms", res["fwd_bwd_ms"] - res["fwd_ms"])
    rec("opt_ms", res["step_ms"] - res["fwd_bwd_ms"])
    return res


def main():
    from graphsage_tpu.data import synthetic_power_law

    which = sys.argv[1] if len(sys.argv) > 1 else "100k"
    batches = [int(b) for b in sys.argv[2:]] or [65536]
    t0 = time.time()
    if which == "tiny":
        ds = synthetic_power_law(2000, 10000, num_feats=32, num_classes=4,
                                 seed=0)
        pad = ds.graph.to_padded_sampled(16, np.random.RandomState(99))
    elif which == "1m":
        import tools.bigscale_bench as bb
        bb._patch_setup_devfeats()
        ds = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                                 num_classes=16, seed=0)
        pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    else:
        ds = synthetic_power_law(100_000, 1_000_000, num_feats=602,
                                 num_classes=16, seed=0)
        pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    print(f"# setup {time.time()-t0:.0f}s", file=sys.stderr)

    rows = []
    for b in batches:
        try:
            r = anatomy(ds, pad, b)
        except Exception as e:  # tunnel wedge mid-batch: keep what we have
            print(f"# batch {b} FAILED: {e}", file=sys.stderr)
            continue
        r["workload"] = which
        rows.append(r)
        print("#", json.dumps(r), file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_ANATOMY_r05.json")
    merged = {"note": ("cached sup step per-slice anatomy; scan-of-REPS "
                       "timing, one fetch per measurement (tunnel RTT "
                       "amortized; timing_floor_ms is the measured "
                       "residual).  Derived slices subtract measured "
                       "sub-programs; XLA fusion differences across "
                       "sub-programs are the error bar."),
              "rows": rows}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            have = {(r.get("workload"), r.get("batch"), r.get("mode"))
                    for r in rows}
            merged["rows"] = rows + [
                r for r in old.get("rows", [])
                if (r.get("workload"), r.get("batch"),
                    r.get("mode")) not in have]
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
