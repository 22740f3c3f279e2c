"""Quality vs leaf-cache staleness (refresh_every=k) — VERDICT r03 item 2,
extended to k=8 in round 5 (BIGSCALE_r05.json reports a k=8 composite of
187.7M edges/s at 1M/b131072; the claim needs the quality arm).

Runs the cached supervised pipeline for k in {1, 2, 4, 8} on Cora and Pubmed
(50 epochs, the reference protocol length) and records best val/test F1,
so the throughput lever measured in BIGSCALE_r05.json is defended by a
quality measurement rather than an assumption.  k=1 is the round-3
semantics (refresh every epoch).

Run on the TPU:  python tools/staleness_quality.py
Writes STALENESS_r05.json (round-4 CPU-backend capture stays in
STALENESS_r04.json; this run is on the chip, so the wall_s column also
shows the on-chip refresh-vs-step payoff, VERDICT r04 weak #2).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from graphsage_tpu.data import load_cora, load_pubmed  # noqa: E402
from graphsage_tpu.models import GraphSageConfig  # noqa: E402
from graphsage_tpu.train import CachedTrainer, TrainConfig  # noqa: E402

KS = (1, 2, 4, 8)


def run(ds, b_sz: int, k: int) -> dict:
    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=128)
    tcfg = TrainConfig(learn_method="sup", epochs=50, b_sz=b_sz, seed=824,
                       verbose=False, refresh_every=k)
    tr = CachedTrainer(ds, mcfg, tcfg, extend_batches=False)
    t0 = time.time()
    tr.fit()
    best = max((h for h in tr.history if "test_f1" in h),
               key=lambda h: h["val_f1"], default={})
    return {"refresh_every": k, "best_val_f1": round(tr.max_vali_f1, 4),
            "test_f1_at_best_val": round(best.get("test_f1", float("nan")),
                                         4),
            "wall_s": round(time.time() - t0, 1)}


def main() -> None:
    import jax
    out = {"protocol": "cached sup pipeline, 50 epochs, seed 824, "
                       "plain batches (extend_batches=False), fanout 10, "
                       "2x128; k=1 is round-3 refresh-per-epoch semantics",
           "backend": str(jax.devices()[0].device_kind
                          if jax.devices() else "unknown")}
    for name, loader, b_sz in (("cora", load_cora, 512),
                               ("pubmed", load_pubmed, 1024)):
        ds = loader()
        out[name] = [run(ds, b_sz, k) for k in KS]
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    with open("STALENESS_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
