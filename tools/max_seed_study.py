"""MAX-aggregator 5-seed quality study at ONE code version (VERDICT r03
item 4: the round-3 table composited seeds measured at two different
HEADs; a parity study needs one code version per arm).

Runs the compact Trainer (the reference-protocol parity path) on Cora,
supervised, agg MAX, 50 epochs, b_sz 20, best-val→test — the identical
protocol the reference arm was measured under
(/root/reference/src/models.py:316-326 MAX; REF_SUP_MAX_seed*.json) —
for all five seeds, and writes OUR_SUP_MAX_seeds_r05.json plus the
mean ± std / 95% CI summary.

Run on the TPU:  python tools/max_seed_study.py  [~25 min]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEEDS = (824, 1, 7, 42, 123)


def main() -> None:
    from graphsage_tpu.data import load_cora
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig

    out = {
        "impl": "graphsage_tpu compact Trainer (TPU), round-5 HEAD",
        "protocol": "sup, 50 epochs, b_sz 20, agg MAX, best-val->test",
        "dataset": "cora (real citation graph, synthesized content)",
        "seeds": {},
    }
    vals = []
    for seed in SEEDS:
        ds = load_cora(seed=seed)
        mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                               out_size=128, agg_func="MAX")
        tcfg = TrainConfig(learn_method="sup", epochs=50, b_sz=20,
                           seed=seed, verbose=False)
        tr = Trainer(ds, mcfg, tcfg)
        t0 = time.time()
        tr.fit()
        best = max((h for h in tr.history if "test_f1" in h),
                   key=lambda h: h["val_f1"], default={})
        rec = {"best_val_f1": round(tr.max_vali_f1, 4),
               "test_f1": round(best.get("test_f1", float("nan")), 4),
               "wall_s": round(time.time() - t0, 1)}
        out["seeds"][str(seed)] = rec
        vals.append(tr.max_vali_f1)
        print(f"# seed {seed}: {json.dumps(rec)}", file=sys.stderr)

    v = np.asarray(vals)
    out["summary"] = {
        "mean_val_f1": round(float(v.mean()), 4),
        "std": round(float(v.std(ddof=1)), 4),
        "ci95_halfwidth": round(
            float(2.776 * v.std(ddof=1) / np.sqrt(len(v))), 4),  # t(4, .975)
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "OUR_SUP_MAX_seeds_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
