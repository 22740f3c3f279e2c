"""Measure the host/device overlap win: compact-Trainer epoch time with
prefetch_depth=0 (serial reference path) vs 2 (bounded worker thread).

The compact pipeline's per-step host work (pair sampling + C++ compact
build + label assembly) is what the prefetch hides; the dense/cached
pipelines sample in-jit and have no host work to hide.

Usage:  python tools/prefetch_bench.py [--dataset cora] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--b_sz", type=int, default=128)
    ap.add_argument("--learn_method", default="sup")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from graphsage_tpu.data import load_cora, load_pubmed
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig

    ds = {"cora": load_cora, "pubmed": load_pubmed}[args.dataset]()
    mcfg = GraphSageConfig(num_layers=2, input_size=ds.feature_dim,
                           out_size=128)

    def run(depth: int) -> float:
        tcfg = TrainConfig(learn_method=args.learn_method, b_sz=args.b_sz,
                           epochs=args.epochs, seed=824, verbose=False,
                           prefetch_depth=depth)
        tr = Trainer(ds, mcfg, tcfg)
        tr.train_epoch()          # warmup epoch: compiles all buckets
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            tr.train_epoch()
        return (time.perf_counter() - t0) / args.epochs

    serial = run(0)
    overlapped = run(2)
    result = {
        "dataset": args.dataset, "b_sz": args.b_sz,
        "learn_method": args.learn_method,
        "epoch_s_serial": round(serial, 3),
        "epoch_s_prefetch2": round(overlapped, 3),
        "speedup": round(serial / overlapped, 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
