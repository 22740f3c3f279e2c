"""Does BFS locality reordering speed the 1M-node leaf-cache refresh?

The refresh is the config-5 step's second-binding term (374-377 ms/epoch,
BIGSCALE_r05.json): a [10M-row, width-602] bf16 random gather = 12 GB at
the measured ~32-67 GB/s wide-row band.  Hypothesis: the gather rate is
partly locality-bound (page/cache-line reuse), and relabeling the graph by
BFS order (parallel/partition.py::bfs_reorder — the dist pipeline already
does this) clusters each node's neighbor ids near its own id, so the
per-row DMAs land in nearby HBM pages.

Measures the jitted refresh (scalar-probe fetch, median of 3) on the SAME
1M/10M graph under (a) the raw synthetic labeling and (b) the BFS
relabeling.  Semantics are identical — relabeling is a graph isomorphism,
and the subset draw is uniform either way.  Writes/merges the result into
PROFILE_ANATOMY_r05.json as refresh_locality rows.

Run on the TPU:  python tools/refresh_locality.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_refresh(feats, neighbors, degrees, fanout=10):
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.train.cached import refresh_leaf_cache

    @jax.jit
    def refresh(k, feats, neighbors, degrees):
        cf, cc = refresh_leaf_cache(k, feats, neighbors, degrees, fanout)
        # the probe MUST consume cf: a sum over cc alone lets XLA
        # dead-code-eliminate the entire 12 GB feature gather (measured:
        # 94 ms with cf unused vs 374-377 ms real — this DCE trap is what
        # produced round 4's irreproducible "103 ms" diagnostic).
        # Returning the full [1M, 602] cf would add a 1.2 GB output
        # buffer; reducing it keeps the gather live at zero output cost.
        return jnp.sum(cf.astype(jnp.float32)) + jnp.sum(cc)

    key = jax.random.PRNGKey(824)
    np.asarray(refresh(key, feats, neighbors, degrees))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(refresh(key, feats, neighbors, degrees))
        reps.append(time.perf_counter() - t0)
    return float(np.median(reps)) * 1e3, [round(r * 1e3, 1) for r in reps]


def main():
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.parallel.partition import bfs_reorder, relabel_dataset

    t0 = time.time()
    ds = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    print(f"# graph {time.time()-t0:.0f}s", file=sys.stderr)

    # device-generated feature table (content irrelevant to gather rate;
    # avoids the 1.2 GB tunnel upload — tools/bigscale_bench.py rationale)
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (ds.num_nodes, ds.feature_dim),
                              dtype=jnp.bfloat16) * 0.1

    raw_ms, raw_reps = _time_refresh(feats, jnp.asarray(pad.neighbors),
                                     jnp.asarray(pad.degrees))
    print(f"# raw labeling: {raw_ms:.1f} ms {raw_reps}", file=sys.stderr)

    t0 = time.time()
    perm = bfs_reorder(ds.graph)
    ds2 = relabel_dataset(ds, perm)
    pad2 = ds2.graph.to_padded_sampled(32, np.random.RandomState(99))
    reorder_s = time.time() - t0
    print(f"# bfs_reorder + relabel {reorder_s:.0f}s", file=sys.stderr)

    bfs_ms, bfs_reps = _time_refresh(feats, jnp.asarray(pad2.neighbors),
                                     jnp.asarray(pad2.degrees))
    print(f"# bfs labeling: {bfs_ms:.1f} ms {bfs_reps}", file=sys.stderr)

    rows = [{"workload": "1m", "mode": "refresh_locality",
             "raw_refresh_ms": round(raw_ms, 1),
             "bfs_refresh_ms": round(bfs_ms, 1),
             "speedup": round(raw_ms / bfs_ms, 3),
             "raw_reps_ms": raw_reps, "bfs_reps_ms": bfs_reps,
             "host_reorder_s": round(reorder_s, 1),
             "note": ("identical refresh program, graph relabeled by BFS "
                      "order; delta isolates HBM locality of the wide-row "
                      "gather")}]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_ANATOMY_r05.json")
    merged = {"rows": rows}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            merged = old
            merged["rows"] = [r for r in old.get("rows", [])
                              if r.get("mode") != "refresh_locality"] + rows
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
