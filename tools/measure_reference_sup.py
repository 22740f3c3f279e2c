"""Run the reference's FULL supervised protocol (torch CPU, unmodified code
from the read-only mount) on the same synthesized-Cora data, recording its
best-val/test F1 — the quality baseline for the framework's sup numbers
(BASELINE.json config 1; reference loop src/main.py:70-76: apply_model per
epoch + evaluate per epoch with best-val→test selection).

Usage:
  python tools/measure_reference_sup.py --epochs 50 --agg_func MEAN \
      --out REF_SUP.json
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
from collections import defaultdict
from types import SimpleNamespace

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--b_sz", type=int, default=20)
    ap.add_argument("--seed", type=int, default=824)
    ap.add_argument("--agg_func", default="MEAN", choices=["MEAN", "MAX"])
    ap.add_argument("--dataSet", default="cora", choices=["cora", "pubmed"])
    ap.add_argument("--data_root", default=None,
                    help="directory holding the REAL content files "
                         "(cora.content+cora.cites / NODE.paper.tab+"
                         "DIRECTED.cites.tab); the loader takes the real "
                         "branch automatically — the turnkey parity recipe "
                         "(README 'Real data')")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # Python >=3.11 removed random.sample(set); the reference relies on it.
    import random as _random
    _orig_sample = _random.sample

    def _sample(pop, k):
        if isinstance(pop, (set, frozenset)):
            pop = sorted(pop)
        return _orig_sample(pop, k)

    _random.sample = _sample

    ref_models = load_ref("ref_models", "/root/reference/src/models.py")
    ref_utils = load_ref("ref_utils", "/root/reference/src/utils.py")
    ref_models.random.sample = _sample

    # evaluate() checkpoints to models/…torch each improvement — a side
    # artifact, not protocol; skip the disk write
    torch.save = lambda *a, **k: None

    _random.seed(args.seed)
    np.random.seed(args.seed)
    torch.manual_seed(args.seed)

    from graphsage_tpu.data import load_cora, load_pubmed
    loader = load_cora if args.dataSet == "cora" else load_pubmed
    kw = {"root": args.data_root} if args.data_root else {}
    ds = loader(seed=args.seed, **kw)
    adj = defaultdict(set)
    for v in range(ds.graph.num_nodes):
        adj[v] = set(int(x) for x in ds.graph.neighbors(v))

    dc = SimpleNamespace()
    for attr, val in (("test", np.asarray(ds.test_nodes)),
                      ("val", np.asarray(ds.val_nodes)),
                      ("train", np.asarray(ds.train_nodes)),
                      ("labels", np.asarray(ds.labels)),
                      ("adj_lists", adj)):
        setattr(dc, f"{args.dataSet}_{attr}", val)

    device = torch.device("cpu")
    feats = torch.FloatTensor(ds.features)
    graphSage = ref_models.GraphSage(2, feats.size(1), 128, feats, adj,
                                     device, gcn=False,
                                     agg_func=args.agg_func)
    classification = ref_models.Classification(128, ds.num_classes)
    unsup = ref_models.UnsupervisedLoss(adj, np.asarray(ds.train_nodes),
                                        device)

    max_vali_f1 = 0.0
    t0 = time.time()
    for epoch in range(args.epochs):
        print(f"--------EPOCH {epoch}--------", flush=True)
        graphSage, classification = ref_utils.apply_model(
            dc, args.dataSet, graphSage, classification, unsup, args.b_sz,
            "normal", device, "sup")
        max_vali_f1 = ref_utils.evaluate(
            dc, args.dataSet, graphSage, classification, device,
            max_vali_f1, "ref_sup", epoch)
        print(f"epoch {epoch}: best val F1 {max_vali_f1:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    result = {
        "impl": "reference torch-cpu (unmodified)",
        "protocol": (f"sup, {args.epochs} epochs, b_sz {args.b_sz}, "
                     f"agg {args.agg_func}, evaluate (best-val->test) "
                     f"per epoch"),
        "dataset": (f"{args.dataSet} (real citation graph, "
                    + ("synthesized content)" if ds.synthetic_features
                       else f"REAL content from {args.data_root})")),
        "seed": args.seed,
        "agg_func": args.agg_func,
        "best_val_f1": round(max_vali_f1, 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
