"""Run the reference's FULL unsup protocol (torch CPU, unmodified code from
the read-only mount) on the same synthesized-Cora data this framework
benches on, and record its best-val F1 — the missing quality baseline for
the framework's unsup/plus_unsup numbers.

Protocol (reference src/main.py:70-76): per epoch apply_model() with the
unsup 'normal' loss (batch extension + walk positives + BFS negatives,
src/utils.py:113-193); after every 2nd epoch train_classification()
(src/utils.py:80-111: classifier-only SGD lr 0.5 on CACHED full-graph
embeddings, with evaluate() re-embedding val/test FRESH each classifier
epoch — the best-val→test selection, src/utils.py:13-57).

Usage:
  python tools/measure_reference_unsup.py --epochs 2 --clf_epochs 800 \
      --out REF_UNSUP.json
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
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--clf_epochs", type=int, default=800)
    ap.add_argument("--b_sz", type=int, default=20)
    ap.add_argument("--seed", type=int, default=824)
    ap.add_argument("--unsup_loss", default="normal")
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

    from graphsage_tpu.data import load_cora
    ds = load_cora()
    adj = defaultdict(set)
    for v in range(ds.graph.num_nodes):
        adj[v] = set(int(x) for x in ds.graph.neighbors(v))

    # fake DataCenter: the attribute surface utils.py reads
    dc = SimpleNamespace(
        cora_test=np.asarray(ds.test_nodes),
        cora_val=np.asarray(ds.val_nodes),
        cora_train=np.asarray(ds.train_nodes),
        cora_labels=np.asarray(ds.labels),
        cora_adj_lists=adj,
    )

    device = torch.device("cpu")
    feats = torch.FloatTensor(ds.features)
    graphSage = ref_models.GraphSage(2, feats.size(1), 128, feats, adj,
                                     device, gcn=False, agg_func="MEAN")
    classification = ref_models.Classification(128, ds.num_classes)
    unsup = ref_models.UnsupervisedLoss(adj, np.asarray(ds.train_nodes),
                                        device)

    max_vali_f1 = 0.0
    t0 = time.time()
    for epoch in range(args.epochs):
        print(f"--------EPOCH {epoch}--------", flush=True)
        graphSage, classification = ref_utils.apply_model(
            dc, "cora", graphSage, classification, unsup, args.b_sz,
            args.unsup_loss, device, "unsup")
        if (epoch + 1) % 2 == 0:
            classification, max_vali_f1 = ref_utils.train_classification(
                dc, graphSage, classification, "cora", device,
                max_vali_f1, "ref_unsup", epochs=args.clf_epochs)
        print(f"epoch {epoch}: best val F1 {max_vali_f1:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    result = {
        "impl": "reference torch-cpu (unmodified)",
        "protocol": (f"unsup {args.unsup_loss}, {args.epochs} epochs, "
                     f"train_classification every 2nd epoch with "
                     f"{args.clf_epochs} clf epochs (cached train embs, "
                     f"fresh val/test re-embed per clf epoch)"),
        "dataset": "cora (real citation graph, synthesized content)",
        "seed": args.seed,
        "best_val_f1": round(max_vali_f1, 4),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
