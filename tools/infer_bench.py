"""Serving-path throughput artifact: deterministic full-graph inference.

Times ``graphsage_tpu.infer`` full-neighborhood propagation (infer.py) on
the real chip and writes INFER_r02.json.

Methodology: inputs are placed on device ONCE (as InferenceSession does),
the timed region is the jitted embed-all with a scalar-fetch barrier
(``block_until_ready`` does not reliably block on the experimental remote
TPU backend — same caveat as bench.py's _timed), and the one-time costs a
serving process pays — table upload and the [N, H] result pull — are
reported separately.  On this environment's tunnel the result pull runs at
~27 MB/s and would otherwise swamp the compute 100x; a production TPU host
fetches over PCIe.

Run on the TPU (no JAX_PLATFORMS override):  python tools/infer_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data import (load_cora, load_pubmed,
                                    synthetic_power_law)
    from graphsage_tpu.data.graph import PaddedAdjacency
    from graphsage_tpu.infer import full_graph_embeddings
    from graphsage_tpu.models import GraphSageConfig, init_graphsage

    device = jax.devices()[0].device_kind
    rows = []

    def run(name, ds, pad, dtype, agg, note=None):
        cfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                              out_size=128, agg_func=agg,
                              compute_dtype=dtype)
        params = init_graphsage(jax.random.PRNGKey(824), cfg)
        t0 = time.perf_counter()
        feats = jax.device_put(jnp.asarray(ds.features))
        dpad = PaddedAdjacency(
            neighbors=jax.device_put(jnp.asarray(pad.neighbors)),
            degrees=jax.device_put(jnp.asarray(pad.degrees)),
            true_degrees=pad.true_degrees, truncated=pad.truncated)
        # barrier must touch EVERY uploaded array (device_put is async;
        # summing only degrees would let the big transfers bleed into
        # first_call_s)
        np.asarray(jnp.sum(feats[0]) + jnp.sum(dpad.neighbors[0])
                   + jnp.sum(dpad.degrees))
        upload_s = time.perf_counter() - t0

        n = pad.num_nodes
        # the exact shipped serving path (fetch=False keeps the result on
        # device so the timed region excludes the host pull)
        emb = lambda: full_graph_embeddings(params, cfg, feats, dpad,
                                            fetch=False)
        t0 = time.perf_counter()
        np.asarray(jnp.sum(emb()))                 # compile + run
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            np.asarray(jnp.sum(emb()))             # device time + barrier
        dt = (time.perf_counter() - t0) / REPS
        t0 = time.perf_counter()
        out = np.asarray(emb(), dtype=np.float32)  # the [N, H] result pull
        fetch_s = time.perf_counter() - t0
        assert np.isfinite(out).all()

        row = {
            "name": name, "dtype": dtype, "agg": agg,
            "nodes": n, "table_width": pad.width,
            "edge_slots": int(pad.degrees.sum()),
            "embed_all_ms": round(dt * 1000, 3),
            "nodes_per_sec": round(n / dt, 1),
            "edge_slots_per_sec": round(
                float(pad.degrees.sum()) * cfg.num_layers / dt, 1),
            "first_call_s": round(compile_s, 2),
            "one_time_upload_s": round(upload_s, 2),
            "result_pull_s": round(fetch_s, 2),
            "device": device,
        }
        if note:
            row["note"] = note
        rows.append(row)
        print("#", json.dumps(row), flush=True)

    cora = load_cora()
    run("cora_full_adj_f32", cora, cora.graph.to_padded(), "float32",
        "MEAN", note="full adjacency (max-degree table): exact serving")
    pubmed = load_pubmed()
    run("pubmed_full_adj_bf16", pubmed, pubmed.graph.to_padded(),
        "bfloat16", "MEAN",
        note="full adjacency: exact serving on the real citation graph")
    pl = synthetic_power_law(100_000, 1_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pl32 = pl.graph.to_padded_sampled(32, np.random.RandomState(99))
    run("powerlaw100k_cap32_bf16", pl, pl32, "bfloat16", "MEAN",
        note="width-32 capped table (documented truncated serving mode "
             "for power-law degrees); edge_slots_per_sec counts both "
             "layers' aggregations")
    run("powerlaw100k_cap32_bf16_max", pl, pl32, "bfloat16", "MAX")

    if "--bigscale" in sys.argv:
        # BASELINE config-5 scale (tools/bigscale_bench.py workload):
        # ~90 s of host generation, hence opt-in
        big = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                                  num_classes=16, seed=0)
        big32 = big.graph.to_padded_sampled(16, np.random.RandomState(99))
        run("powerlaw1M_cap16_bf16", big, big32, "bfloat16", "MEAN",
            note="10M-edge config-5 scale, width-16 table")

    with open("INFER_r02.json", "w") as f:
        json.dump({"rows": rows, "reps": REPS,
                   "note": ("timed region = on-device embed-all with "
                            "scalar-fetch barrier; uploads and the [N,H] "
                            "result pull are one-time serving costs "
                            "reported per row (the remote-tunnel pull "
                            "here is ~27 MB/s — an environment artifact, "
                            "not chip time)")}, f, indent=1)
    print(f"wrote INFER_r02.json ({len(rows)} rows)")


if __name__ == "__main__":
    main()
