"""10M-edge workload artifact (BASELINE.json config-5 scale) on one chip.

Round-4 rework (VERDICT r03 item 2): honest epoch accounting + the
staleness lever, measured.

- T is the TRUE epoch length: ceil(train_split / B) — at B=65536 over the
  ~500k-node train split that is T=8, not the T=20 the round-3 row used
  (which flattered the refresh amortization by 2.5x).
- The refresh and the step are measured SEPARATELY (jitted refresh alone;
  the reuse-epoch program from train/cached.py for step-only), then
  composed: edges/s at refresh_every=k = T·edges_per_batch /
  (T·step_only + refresh/k).  k=1 reproduces the fused program's honest
  number; quality vs k is measured in STALENESS_r04.json (Cora/Pubmed
  50-epoch F1 held through k=4).
- A B=131072 row exploits the step's measured structure: the layer-1
  full-table GEMM pair is ∝N (not ∝B), so doubling the batch amortizes
  the N-bound slice over 2x the edges.

Generates the 1M-node power-law graph (~100 s of host time — why this row
is not part of bench.py) and writes BIGSCALE_r05.json.  HBM footprint:
bf16 feats 1.2 GB + cache 1.2 GB + padded adjacency 128 MB.

Run on the TPU (no JAX_PLATFORMS override):  python tools/bigscale_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _row_from_dt, _setup, _timed

STALENESS_KS = (1, 2, 4, 8)


def _patch_setup_devfeats():
    """bench._setup variant that GENERATES the [1M, 602] feature table on
    device instead of uploading the host copy: the upload is 1.2 GB
    through the tunnel, which on slow-tunnel phases took 20+ minutes and
    killed the first round-4 bigscale attempts (the tunnel rate swings
    1-143 MB/s).  Feature CONTENT is irrelevant to throughput (the step
    is addressing/byte-bound; identical shapes and dtype).  Must avoid
    ever constructing the host-backed device array — jnp.asarray uploads
    eagerly."""
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier

    def setup_devfeats(ds, pad, dtype, batch, steps, hidden, agg="MEAN"):
        mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                               out_size=hidden, compute_dtype=dtype,
                               agg_func=agg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(824))
        params = {"sage": init_graphsage(k1, mcfg),
                  "clf": init_classifier(k2, hidden, ds.num_classes)}
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (ds.num_nodes, ds.feature_dim),
            dtype=jnp.dtype(dtype)) * 0.1
        neighbors = jnp.asarray(pad.neighbors)
        degrees = jnp.asarray(pad.degrees)
        rng = np.random.RandomState(0)
        batches = jnp.asarray(rng.randint(
            0, ds.num_nodes, size=(steps, batch)).astype(np.int32))
        labels = jnp.take(jnp.asarray(ds.labels.astype(np.int32)),
                          batches, axis=0)
        return mcfg, params, feats, neighbors, degrees, batches, labels

    bench_mod._setup = setup_devfeats
    return setup_devfeats


def main():
    import jax

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.cached import (
        make_cached_sup_epoch,
        make_cached_sup_epoch_reuse,
        refresh_leaf_cache,
    )

    global _setup
    _setup = _patch_setup_devfeats()

    t0 = time.time()
    ds = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    gen_s = time.time() - t0
    print(f"# generated 1M nodes / {int(pad.true_degrees.sum())} edge slots "
          f"in {gen_s:.0f}s", file=sys.stderr)

    import os
    # GS_BIGSCALE_ROWS limits which rows run (comma list of: 65536,
    # 131072, unsup, direct) so a capture can fit inside a short
    # healthy-tunnel phase and be merged across runs; default = all but
    # the direct k-cycle rows (those re-measure what the composite column
    # already covers — run them explicitly to validate it).
    only = set((os.environ.get("GS_BIGSCALE_ROWS") or
                "65536,131072,unsup").split(","))

    train_split = ds.num_nodes // 2  # loaders split: ~half train
    rows = []
    refresh_ms = None

    # refresh alone (same jitted body the epoch programs inline), with the
    # tables as ARGUMENTS, not a closure: the B=131072 iteration must not
    # time against (or keep alive) the B=65536 iteration's 1.2 GB feats
    # (advisor r04).  Same shapes across iterations → compiled once.
    import jax.numpy as jnp

    @jax.jit
    def refresh_fn(k, feats, neighbors, degrees):
        cf, cc = refresh_leaf_cache(k, feats, neighbors, degrees, 10)
        return cf, cc, jnp.sum(cc)

    # Tunnel round-trip floor, recorded alongside the rows: every timed
    # rep pays one dispatch+fetch RTT, so at honest T=8 the per-step
    # numbers carry RTT/T ms of tunnel overhead and the refresh number a
    # full RTT (measured 27 ms on the round-5 capture day — real TPU
    # deployments pay microseconds here; report, don't subtract).
    @jax.jit
    def _probe(x):
        return x + 1.0

    _x = jnp.float32(0.0)
    np.asarray(_probe(_x))
    _rtts = []
    for _ in range(7):
        _t = time.perf_counter()
        np.asarray(_probe(_x))
        _rtts.append(time.perf_counter() - _t)
    rtt_ms = float(np.median(_rtts)) * 1e3
    print(f"# tunnel dispatch+fetch RTT: {rtt_ms:.1f} ms", file=sys.stderr)

    for batch in (65536, 131072):
        if str(batch) not in only:
            continue
        steps = -(-train_split // batch)  # honest T
        dtype = "bfloat16"
        (mcfg, params, feats, neighbors, degrees, batches,
         labels) = _setup(ds, pad, dtype, batch, steps, 128)
        key = jax.random.PRNGKey(824)

        # Timing fetches a device-side SCALAR (sum of counts), not the
        # [1M] counts row — a 4 MB fetch over a slow tunnel would swamp
        # the measurement.
        cache = refresh_fn(key, feats, neighbors, degrees)
        if refresh_ms is None:
            np.asarray(cache[2])
            reps = []
            for _ in range(3):
                t1 = time.perf_counter()
                cache = refresh_fn(key, feats, neighbors, degrees)
                np.asarray(cache[2])
                reps.append(time.perf_counter() - t1)
            refresh_ms = float(np.median(reps)) * 1e3
            print(f"# refresh alone: {refresh_ms:.1f} ms", file=sys.stderr)

        # step-only: the reuse-epoch program over the held cache
        reuse_fn = jax.jit(make_cached_sup_epoch_reuse(mcfg, fanout=10))
        dt_step, reps_step = _timed(
            reuse_fn, (params, feats, cache[0], cache[1], neighbors,
                       degrees, batches, labels, key), steps)

        # fused (refresh inside, k=1) at honest T — the directly-measured
        # baseline the composition must reproduce
        fused_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=10))
        dt_fused, reps_fused = _timed(
            fused_fn, (params, feats, neighbors, degrees, batches, labels,
                       key), steps)

        row = _row_from_dt(f"powerlaw1M_b{batch}_cached_{dtype}", "cached",
                           dtype, batch, ds, pad, dt_fused, 10, 128)
        edges = row["edges_per_sec"] * dt_fused  # edges per step unit
        row.update({
            "honest_T": steps,
            "rep_step_ms": [round(r * 1e3, 3) for r in reps_fused],
            "steponly_ms": round(dt_step * 1e3, 3),
            "steponly_rep_ms": [round(r * 1e3, 3) for r in reps_step],
            "refresh_ms_per_epoch": round(refresh_ms, 1),
            "staleness_edges_per_sec": {
                f"k{k}": round(edges / (dt_step + refresh_ms / 1e3
                                        / (k * steps)), 1)
                for k in STALENESS_KS},
        })
        rows.append(row)
        print("#", json.dumps(row), file=sys.stderr)

    # direct k-cycle measurement: the staleness_edges_per_sec column above
    # is an arithmetic composite (step-only + refresh/k); this times an
    # ACTUAL refresh_every=k cycle — one refresh + k reuse-epochs threaded
    # through params, one device fetch at the end — so the headline k=8
    # number is a measurement, not a composition.
    if "direct" in only:
        import jax.numpy as jnp

        from bench import edges_per_batch

        batch = 131072
        steps = -(-train_split // batch)
        (mcfg, params, feats, neighbors, degrees, batches,
         labels) = _setup(ds, pad, "bfloat16", batch, steps, 128)
        reuse_fn = jax.jit(make_cached_sup_epoch_reuse(mcfg, fanout=10))
        key = jax.random.PRNGKey(824)
        cache = refresh_fn(key, feats, neighbors, degrees)
        p, losses = reuse_fn(params, feats, cache[0], cache[1], neighbors,
                             degrees, batches, labels, key)
        np.asarray(losses)  # compile + warm both programs
        for k in (4, 8):
            reps = []
            for r in range(3):
                p = params
                kk = jax.random.PRNGKey(1000 + r)
                t1 = time.perf_counter()
                kk, kr = jax.random.split(kk)
                cache = refresh_fn(kr, feats, neighbors, degrees)
                for _ in range(k):
                    kk, ke = jax.random.split(kk)
                    p, losses = reuse_fn(p, feats, cache[0], cache[1],
                                         neighbors, degrees, batches,
                                         labels, ke)
                np.asarray(losses)
                reps.append(time.perf_counter() - t1)
            wall = float(np.median(reps))
            edges_cycle = k * steps * edges_per_batch(batch, 2, 10)
            row = {
                "name": f"powerlaw1M_b{batch}_cached_bfloat16_direct_k{k}",
                "pipeline": "cached", "dtype": "bfloat16", "agg": "MEAN",
                "batch": batch, "nodes": ds.num_nodes,
                "refresh_every": k, "honest_T": steps,
                "cycle_wall_s": round(wall, 4),
                "cycle_rep_s": [round(x, 4) for x in reps],
                "edges_per_sec": round(edges_cycle / wall, 1),
                "note": ("DIRECT refresh_every=k cycle: 1 refresh + k "
                         "reuse-epochs timed as one window (single final "
                         "fetch) — validates the composed "
                         "staleness_edges_per_sec column"),
            }
            rows.append(row)
            print("#", json.dumps(row), file=sys.stderr)

    # unsup (normal) at scale, honest T for B=32768
    if "unsup" in only:
        from bench import run_unsup_row
        row = run_unsup_row("powerlaw1M_b32768_cached_bfloat16_unsup", ds,
                            pad, 32768, "bfloat16",
                            steps=-(-train_split // 32768))
        rows.append(row)
        print("#", json.dumps(row), file=sys.stderr)

    out = {
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "workload": {"nodes": ds.num_nodes,
                     "edge_slots": int(pad.true_degrees.sum()),
                     "feat_dim": 602, "hidden": 128, "fanout": 10,
                     "train_split": train_split},
        "host_generation_s": round(gen_s, 1),
        "note": ("BASELINE config-5 scale on ONE chip, HONEST epoch "
                 "accounting: T = ceil(train_split/B), refresh measured "
                 "separately from the step (round-3's T=20 flattered the "
                 "refresh amortization).  staleness_edges_per_sec composes "
                 "step-only + refresh/k for refresh_every=k "
                 "(train/cached.py reuse drivers; quality vs k in "
                 "STALENESS_r05.json, on-chip).  direct_k rows, when "
                 "captured, measure the actual k-cycle end-to-end."),
        "rows": rows,
    }
    # merge with rows captured by earlier (row-subset) runs: fresh rows win
    if os.path.exists("BIGSCALE_r05.json"):
        try:
            with open("BIGSCALE_r05.json") as f:
                old = json.load(f)
            have = {r["name"] for r in rows}
            out["rows"] = rows + [r for r in old.get("rows", [])
                                  if r.get("name") not in have]
        except Exception:
            pass
    with open("BIGSCALE_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows[0]))


if __name__ == "__main__":
    main()
