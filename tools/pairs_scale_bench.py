"""Exact-negative host cost at config-5-class scale (VERDICT r03 item 3).

The unsup bench row synthesizes pair tensors (bench.py docstring) and
PREFETCH_r02 measured host pair sampling only at Cora scale; this tool
measures the real `PairSampler.sample_batch` wall at the 100k-node/1M-edge
power-law workload where "auto" picks exact BFS closures (reference
semantics, /root/reference/src/models.py:153-167):

- per-root closure cost, lazy per-root path vs the batched C++ thread-pool
  builder (csrc/gs_native.cpp::gs_far_lists);
- the FULL first epoch (every train node's closure built once — the cost
  the LRU cache then amortizes away for the rest of the process);
- steady-state sample_batch (warm cache) — the per-step host cost that
  prefetch overlaps with device compute;
- uniform-mode comparison + the data behind the auto exact/uniform rule.

Writes PAIRS_SCALE_r04.json.  Pure host work: run on CPU
(JAX_PLATFORMS=cpu; jax is only imported transitively).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from graphsage_tpu.data import synthetic_power_law  # noqa: E402
from graphsage_tpu.native import far_lists_native  # noqa: E402
from graphsage_tpu.sampler.pairs import PairSampler  # noqa: E402


def main() -> None:
    ds = synthetic_power_law(100_000, 1_000_000, num_feats=8,
                             num_classes=16, seed=0)
    g = ds.graph
    train = ds.train_nodes
    rng = np.random.RandomState(0)
    out = {
        "workload": "powerlaw 100k nodes / 1M edges "
                    f"({len(g.indices)} directed slots), "
                    f"{len(train)} train nodes",
        "host_cores": os.cpu_count(),
        "num_neg": 100,  # reference normal-loss count (src/utils.py:119-122)
    }

    # --- per-root: lazy path (bfs_closure_native + numpy postprocess) ----
    ps_lazy = PairSampler(g, train, negative_mode="exact")
    roots = rng.choice(train, 128, replace=False)
    t0 = time.perf_counter()
    for r in roots:
        ps_lazy._far_nodes(int(r))
    out["per_root_lazy_ms"] = round(
        (time.perf_counter() - t0) / len(roots) * 1e3, 2)

    # --- per-root: batched C++ thread pool ------------------------------
    roots2 = rng.choice(train, 1024, replace=False).astype(np.int32)
    t0 = time.perf_counter()
    far = far_lists_native(g.indptr, g.indices, g.num_nodes, roots2, 5,
                           train)
    dt = time.perf_counter() - t0
    out["per_root_batched_ms"] = round(dt / len(roots2) * 1e3, 2)
    out["edge_visit_rate_per_s"] = round(len(roots2) * len(g.indices) / dt)
    sizes = [len(f) for f in far]
    out["far_list_sizes"] = {"min": int(np.min(sizes)),
                             "median": int(np.median(sizes)),
                             "max": int(np.max(sizes))}

    # --- FULL first epoch: every train closure once via sample_batch ----
    ps = PairSampler(g, train)  # auto -> exact at this scale
    assert ps.negative_mode == "exact", ps.negative_mode
    b = 4096
    order = np.random.RandomState(1).permutation(train)
    step_ms = []
    t_epoch = time.perf_counter()
    for lo in range(0, len(order), b):
        chunk = order[lo:lo + b]
        t0 = time.perf_counter()
        ps.sample_batch(chunk, num_neg=100, rng=rng)
        step_ms.append((time.perf_counter() - t0) * 1e3)
    out["first_epoch_wall_s"] = round(time.perf_counter() - t_epoch, 1)
    out["first_epoch_steps"] = len(step_ms)
    out["first_epoch_ms_per_step_median"] = round(
        float(np.median(step_ms)), 1)
    out["far_cache_mb"] = round(ps._far_cache_bytes / 2**20, 1)

    # --- steady state: warm cache ---------------------------------------
    warm_ms = []
    for lo in range(0, b * 8, b):
        chunk = order[lo:lo + b]
        t0 = time.perf_counter()
        ps.sample_batch(chunk, num_neg=100, rng=rng)
        warm_ms.append((time.perf_counter() - t0) * 1e3)
    out["steady_state_ms_per_batch_b4096"] = round(
        float(np.median(warm_ms)), 1)

    # --- uniform mode for comparison ------------------------------------
    ps_u = PairSampler(g, train, negative_mode="uniform")
    uni_ms = []
    for lo in range(0, b * 4, b):
        chunk = order[lo:lo + b]
        t0 = time.perf_counter()
        ps_u.sample_batch(chunk, num_neg=100, rng=rng)
        uni_ms.append((time.perf_counter() - t0) * 1e3)
    out["uniform_ms_per_batch_b4096"] = round(float(np.median(uni_ms)), 1)

    # --- the auto rule, restated against the measurement -----------------
    rate = 300e6 * max(1, os.cpu_count() or 1)
    out["auto_rule"] = {
        "rule": "exact iff n_train * directed_edge_slots / "
                "(300e6 * cores) <= GS_EXACT_NEG_BUDGET_S (default 180)",
        "this_workload_estimate_s": round(
            len(train) * len(g.indices) / rate, 1),
        "config5_1M_10M_estimate_s": round(500_000 * 18_500_000 / rate),
        "decision_here": ps.negative_mode,
    }

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "PAIRS_SCALE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
