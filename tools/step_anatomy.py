"""Per-slice anatomy of the cached supervised step (VERDICT r04 item 4 /
weak #3: the headline's non-scatter ~38% had no per-slice accounting).

Methodology: each slice runs as a `lax.scan` of REPS iterations inside ONE
jitted program (per-iteration PRNG fold-in + a loop-carried checksum that
feeds the next iteration's inputs, so XLA can neither hoist the slice out
of the loop nor overlap iterations), timed with a single device fetch —
the tunnel's ~25 ms dispatch+fetch RTT is paid once per measurement and
divided by REPS, not per rep.  Slices:

  sampling    in-jit frontier draw (sampler/device.py) at batch shape
  l1_gemm     layer-1 full-table GEMM pair (sage_layer_apply over all N)
  h1_gather   + the [M, H] narrow-row gather of the frontier (delta)
  fwd         full cached_forward (adds upper layers + clf head)
  fwd_bwd     + value_and_grad (adds the backward: dW GEMMs + the M-row
              dH1 scatter-add — the measured binding op)
  step        + clip/SGD (the complete training step)
  scatter_bound  isolated M-row [H] scatter-add into [N, H] at the exact
              step shapes (grad-of-gather), the roofline denominator

Workloads: 100k (the bench headline graph) and 1m (BASELINE config-5).
Writes PROFILE_ANATOMY_r05.json.  Run on the TPU:
    python tools/step_anatomy.py [100k|1m] [batch ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 10


def _scan_timed(make_body, reps=REPS):
    """make_body(it, carry) -> new_carry (a f32 scalar folding in the
    slice's result).  Returns (ms_per_rep, total_s)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(c0):
        def body(c, it):
            return make_body(it, c), ()

        c, _ = jax.lax.scan(body, c0, jnp.arange(reps))
        return c

    c = prog(jnp.float32(0.0))
    np.asarray(c)  # compile + warm
    t0 = time.perf_counter()
    c = prog(jnp.float32(1e-9))
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
    cache_feats, cache_count = jax.jit(
        lambda k: refresh_leaf_cache(k, feats, neighbors, degrees,
                                     fanout))(key0)
    jax.block_until_ready(cache_count)

    n = feats.shape[0]
    m = batch * (fanout + 1)
    h = hidden
    res = {"batch": batch, "nodes": n, "frontier_rows": m, "dtype": dtype}

    # epsilon perturbation: ties each iteration's params to the carry so
    # the slice body cannot be hoisted (carry magnitude ~1e-9 -> the
    # perturbation is below bf16 resolution, compute is unchanged)
    def peps(p, c):
        return jax.tree_util.tree_map(lambda x: x * (1.0 + c * 1e-30), p)

    # --- sampling
    def s_sampling(it, c):
        k = jax.random.fold_in(key0, it)
        ids, frontiers = sample_frontiers_dense(
            k, neighbors, degrees, batch_ids,
            num_layers=mcfg.num_layers - 1, fanout=fanout)
        return c + jnp.sum(ids).astype(jnp.float32) * 1e-20 + \
            jnp.sum(frontiers[0].mask).astype(jnp.float32) * 1e-20

    res["sampling_ms"] = round(_scan_timed(s_sampling)[0], 3)

    # --- layer-1 full-table GEMM pair
    w1 = cast_compute(params["sage"]["layers"][0], mcfg)
    cfeats = cast_compute(feats, mcfg)
    ccache = cast_compute(cache_feats, mcfg)

    def s_l1(it, c):
        w = jax.tree_util.tree_map(lambda x: x + c * 1e-30, w1)
        t = sage_layer_apply(w, cfeats, ccache, gcn=False)
        return c + jnp.sum(t.astype(jnp.float32)) * 1e-20

    res["l1_gemm_ms"] = round(_scan_timed(s_l1)[0], 3)

    # --- + frontier gather
    ids_static, _ = jax.jit(lambda k: sample_frontiers_dense(
        k, neighbors, degrees, batch_ids,
        num_layers=mcfg.num_layers - 1, fanout=fanout))(key0)
    jax.block_until_ready(ids_static)

    def s_l1_gather(it, c):
        w = jax.tree_util.tree_map(lambda x: x + c * 1e-30, w1)
        t = sage_layer_apply(w, cfeats, ccache, gcn=False)
        g = jnp.take(t, ids_static, axis=0)
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-20

    d = _scan_timed(s_l1_gather)[0]
    res["l1_gemm_plus_gather_ms"] = round(d, 3)
    res["h1_gather_ms"] = round(d - res["l1_gemm_ms"], 3)

    # --- full forward (+ clf head + nll, no grad)
    def s_fwd(it, c):
        k = jax.random.fold_in(key0, it)
        p = peps(params, c)
        embs = cached_forward(p, mcfg, feats, cache_feats, cache_count,
                              neighbors, degrees, batch_ids, k, fanout)
        logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
        loss = supervised_nll(logp, lab,
                              jnp.ones(batch_ids.shape[0], jnp.float32))
        return c + loss.astype(jnp.float32) * 1e-20

    res["fwd_ms"] = round(_scan_timed(s_fwd)[0], 3)

    # --- forward + backward
    def loss_of(p, k):
        embs = cached_forward(p, mcfg, feats, cache_feats, cache_count,
                              neighbors, degrees, batch_ids, k, fanout)
        logp = classifier_apply(cast_compute(p["clf"], mcfg), embs)
        return supervised_nll(logp, lab,
                              jnp.ones(batch_ids.shape[0], jnp.float32))

    def s_fwd_bwd(it, c):
        k = jax.random.fold_in(key0, it)
        p = peps(params, c)
        loss, grads = jax.value_and_grad(loss_of)(p, k)
        lsum = sum(jnp.sum(g.astype(jnp.float32)) * 1e-20
                   for g in jax.tree_util.tree_leaves(grads))
        return c + loss.astype(jnp.float32) * 1e-20 + lsum

    res["fwd_bwd_ms"] = round(_scan_timed(s_fwd_bwd)[0], 3)

    # --- complete step (matches the epoch program body: carry = params)
    step = make_cached_sup_step(mcfg, fanout=fanout)

    @jax.jit
    def full_steps(p0):
        def body(p, it):
            k = jax.random.fold_in(key0, it)
            p2, loss = step(p, feats, cache_feats, cache_count, neighbors,
                            degrees, batch_ids, lab, k)
            return p2, loss

        p, losses = jax.lax.scan(body, p0, jnp.arange(REPS))
        return losses

    losses = full_steps(params)
    np.asarray(losses)
    t0 = time.perf_counter()
    np.asarray(full_steps(params))
    res["step_ms"] = round((time.perf_counter() - t0) / REPS * 1e3, 3)

    # --- isolated scatter bound at the exact shapes: d(table) of an
    # M-row gather is an M-row [H] scatter-add into [N, H]
    table = jnp.zeros((n, h), dtype=jnp.dtype(dtype))
    dout = jnp.ones((ids_static.shape[0], h), dtype=jnp.dtype(dtype))

    def s_scatter(it, c):
        t = table * (1.0 + c * 1e-30)
        g = jax.grad(lambda tt: jnp.sum(
            jnp.take(tt, ids_static, axis=0).astype(jnp.float32)
            * dout.astype(jnp.float32)))(t)
        return c + jnp.sum(g.astype(jnp.float32)) * 1e-20

    res["scatter_bound_ms"] = round(_scan_timed(s_scatter)[0], 3)
    res["scatter_rows_per_sec"] = round(
        ids_static.shape[0] / (res["scatter_bound_ms"] / 1e3), 1)

    # derived slices
    res["upper_plus_head_fwd_ms"] = round(
        res["fwd_ms"] - res["l1_gemm_plus_gather_ms"] - res["sampling_ms"],
        3)
    res["backward_ms"] = round(res["fwd_bwd_ms"] - res["fwd_ms"], 3)
    res["opt_ms"] = round(res["step_ms"] - res["fwd_bwd_ms"], 3)
    return res


def main():
    import jax

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
        r = anatomy(ds, pad, b)
        r["workload"] = which
        rows.append(r)
        print("#", json.dumps(r), file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_ANATOMY_r05.json")
    merged = {"note": ("cached sup step per-slice anatomy; scan-of-REPS "
                       "timing, one fetch per measurement (tunnel RTT "
                       "amortized).  Derived slices subtract measured "
                       "sub-programs; XLA fusion differences across "
                       "sub-programs are the error bar."),
              "rows": rows}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            have = {(r["workload"], r["batch"]) for r in rows}
            merged["rows"] = rows + [
                r for r in old.get("rows", [])
                if (r.get("workload"), r.get("batch")) not in have]
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
