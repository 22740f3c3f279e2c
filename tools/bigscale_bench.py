"""10M-edge workload artifact (BASELINE.json config-5 scale) on one chip.

Generates the 1M-node power-law graph (~100 s of host time — why this row
is not part of bench.py), runs the flagship cached bf16 pipeline on it,
and writes BIGSCALE_r03.json.  HBM footprint: feats 2.4 GB f32 +
cache table 2.4 GB + padded adjacency 128 MB — comfortably on one v5e.

Run on the TPU (no JAX_PLATFORMS override):  python tools/bigscale_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _row_from_dt, _setup, _timed

STEPS = 20


def main():
    import jax

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.train.cached import make_cached_sup_epoch

    t0 = time.time()
    ds = synthetic_power_law(1_000_000, 10_000_000, num_feats=602,
                             num_classes=16, seed=0)
    pad = ds.graph.to_padded_sampled(32, np.random.RandomState(99))
    gen_s = time.time() - t0
    print(f"# generated 1M nodes / {int(pad.true_degrees.sum())} edge slots "
          f"in {gen_s:.0f}s", file=sys.stderr)

    rows = []
    for batch, dtype in [(65536, "bfloat16"), (32768, "bfloat16")]:
        (mcfg, params, feats, neighbors, degrees, batches,
         labels) = _setup(ds, pad, dtype, batch, STEPS, 128)
        epoch_fn = jax.jit(make_cached_sup_epoch(mcfg, fanout=10))
        dt, reps = _timed(epoch_fn, (params, feats, neighbors, degrees,
                                     batches, labels,
                                     jax.random.PRNGKey(824)), STEPS)
        row = _row_from_dt(f"powerlaw1M_b{batch}_cached_{dtype}", "cached",
                           dtype, batch, ds, pad, dt, 10, 128)
        row["rep_step_ms"] = [round(r * 1000, 3) for r in reps]
        rows.append(row)
        print("#", json.dumps(row), file=sys.stderr)

    # unsup (normal) at scale: encode + gathered pair loss each step
    # (round-3 ops/sddmm.pair_loss_scores path; production pair shapes)
    from bench import run_unsup_row
    row = run_unsup_row("powerlaw1M_b32768_cached_bfloat16_unsup", ds, pad,
                        32768, "bfloat16", steps=STEPS)
    rows.append(row)
    print("#", json.dumps(row), file=sys.stderr)

    out = {
        "workload": {"nodes": ds.num_nodes,
                     "edge_slots": int(pad.true_degrees.sum()),
                     "feat_dim": 602, "hidden": 128, "fanout": 10},
        "host_generation_s": round(gen_s, 1),
        "note": ("BASELINE config-5 scale on ONE chip; the epoch cache "
                 "refresh (all 1M nodes, lax.scan node blocks bounding the "
                 "gather temp) is inside the timed scan.  The layer-1 cost "
                 "model picks full-table mode at these shapes (352M vs "
                 "868M random-access units at B=65536): sequential "
                 "table GEMM over all 1M rows + narrow [H] gathers"),
        "rows": rows,
    }
    with open("BIGSCALE_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows[0]))


if __name__ == "__main__":
    main()
