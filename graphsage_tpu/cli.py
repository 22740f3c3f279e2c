"""Command-line entry point.

Flag-compatible with the reference CLI (reference src/main.py:12-27):
``--dataSet --agg_func --epochs --b_sz --seed --gcn --learn_method
--unsup_loss --max_vali_f1 --name --config`` all behave the same
(``--cuda`` is accepted and ignored — device selection is JAX's; the TPU
backend is used automatically when present).  New flags cover the
framework's extra surface: fanout, checkpointing/resume, strict eval.

Usage:  python -m graphsage_tpu.cli --dataSet cora --epochs 50 --b_sz 20
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native GraphSAGE (graphsage_tpu)")
    # reference-compatible flags (src/main.py:14-26)
    p.add_argument("--dataSet", type=str, default="cora")
    p.add_argument("--agg_func", type=str, default="MEAN",
                   choices=["MEAN", "MAX", "LSTM"])
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--b_sz", type=int, default=20)
    p.add_argument("--seed", type=int, default=824)
    p.add_argument("--cuda", action="store_true",
                   help="accepted for CLI compatibility; ignored "
                        "(JAX selects the TPU backend automatically)")
    p.add_argument("--gcn", action="store_true")
    p.add_argument("--learn_method", type=str, default="sup",
                   choices=["sup", "unsup", "plus_unsup"])
    p.add_argument("--unsup_loss", type=str, default="normal",
                   choices=["normal", "margin"])
    p.add_argument("--max_vali_f1", type=float, default=0)
    p.add_argument("--name", type=str, default="debug")
    p.add_argument("--config", type=str, default=None,
                   help="HOCON experiment file (reference-compatible)")
    # framework flags
    p.add_argument("--pipeline", type=str, default="compact",
                   choices=["compact", "cached", "cached_dist", "dist"],
                   help="compact = per-step reference-parity path (default);"
                        " cached = leaf-cached scanned-epoch path, the "
                        "single-chip throughput mode (BASELINE.md; LSTM "
                        "needs --lstm_hybrid); cached_dist = "
                        "the same pipeline sharded over ALL local devices "
                        "(row-sharded layer-1 table); dist = "
                        "edge-partitioned halo pipeline over the devices "
                        "(train/dist_trainer.py)")
    p.add_argument("--table_cap", type=int, default=None,
                   help="cached pipeline: cap the padded adjacency width "
                        "(uniform subsample per epoch); None = full degree")
    p.add_argument("--lstm_hybrid", action="store_true",
                   help="cached pipelines + --agg_func LSTM: opt into the "
                        "hybrid variant (MEAN leaf cache at layer 1, live "
                        "LSTM cells at layers 2..L — train/cached.py)")
    p.add_argument("--refresh_every", type=int, default=1,
                   help="cached pipeline: refresh the leaf cache every k "
                        "epochs (k>1 = cache staleness, amortizing the "
                        "refresh — the dominant cost at 1M-node scale; "
                        "quality vs k in STALENESS_r04.json)")
    p.add_argument("--no_extend", action="store_true",
                   help="cached pipeline: plain fixed-size supervised "
                        "batches instead of the reference's pair-extended "
                        "batches (the benchmarked fast configuration)")
    p.add_argument("--fanout", type=int, default=10)
    p.add_argument("--num_layers", type=int, default=None,
                   help="override config setting.num_layers")
    p.add_argument("--hidden", type=int, default=None,
                   help="override config setting.hidden_emb_size")
    p.add_argument("--lr", type=float, default=0.7)
    p.add_argument("--clf_epochs", type=int, default=800)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--strict_clf_eval", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="re-embed val/test each classifier epoch exactly "
                        "like the reference (default); --no-strict_clf_eval "
                        "scores on cached embeddings (fast path)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="forward/backward compute precision (bfloat16 is "
                        "the MXU-native mode; params stay float32)")
    p.add_argument("--data_root", type=str, default=None,
                   help="dataset directory override")
    p.add_argument("--export", type=str, default=None,
                   help="after training, write a serving bundle (orbax "
                        "params + model config JSON) to this directory "
                        "(graphsage_tpu.infer loads it without the "
                        "training stack)")
    p.add_argument("--platform", type=str, default="default",
                   choices=["default", "cpu"],
                   help="force the JAX backend: 'cpu' overrides even a "
                        "sitecustomize-pinned remote TPU plugin (the "
                        "JAX_PLATFORMS env var cannot — the plugin "
                        "registration overrides it)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--metrics", type=str, default=None,
                   help="path for jsonl structured metrics")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graphsage_tpu.data import load_dataset
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig
    from graphsage_tpu.utils.config import load_config

    num_layers, hidden = 2, 128  # reference src/experiments.conf:11-12
    if args.config:
        cfg = load_config(args.config)
        num_layers = cfg.get("setting.num_layers", num_layers)
        hidden = cfg.get("setting.hidden_emb_size", hidden)
    if args.num_layers is not None:
        num_layers = args.num_layers
    if args.hidden is not None:
        hidden = args.hidden

    kw = {"root": args.data_root} if args.data_root else {}
    ds = load_dataset(args.dataSet, seed=args.seed, **kw)
    if ds.synthetic_features and not args.quiet:
        print(f"NOTE: content file for {ds.name} absent from mount; "
              "using synthesized features over the real graph")

    mcfg = GraphSageConfig(num_layers=num_layers, input_size=ds.feature_dim,
                           out_size=hidden, gcn=args.gcn,
                           agg_func=args.agg_func,
                           compute_dtype=args.compute_dtype)
    tcfg = TrainConfig(
        learn_method=args.learn_method, unsup_loss=args.unsup_loss,
        b_sz=args.b_sz, epochs=args.epochs, lr=args.lr, seed=args.seed,
        fanout=args.fanout, clf_epochs=args.clf_epochs,
        strict_clf_eval=args.strict_clf_eval, verbose=not args.quiet,
        metrics_path=args.metrics, refresh_every=args.refresh_every)

    # best-val params snapshot: checkpoint_fn fires exactly on val
    # improvement, so the last snapshot is the model that achieved
    # max_vali_f1 — what --export ships (final-epoch params can be worse)
    best = {"params": None, "epoch": None, "test_f1": None}

    def checkpoint_fn(trainer, test_f1):
        import jax as _jax

        from graphsage_tpu.utils.checkpoint import save_checkpoint
        best["params"] = _jax.device_get(trainer.params)
        best["epoch"] = trainer.epoch
        best["test_f1"] = float(test_f1)
        path = os.path.join(
            args.checkpoint_dir,
            f"model_best_{args.name}_ep{trainer.epoch}_{test_f1:.4f}")
        try:
            save_checkpoint(path, trainer.params, trainer.epoch,
                            trainer.max_vali_f1, trainer.rng,
                            jax_key=getattr(trainer, "_key", None))
            if not args.quiet:
                print(f"checkpointed {path}")
        except Exception as e:  # keep training if checkpointing fails
            print(f"checkpoint failed: {e}")

    if args.pipeline == "dist":
        import jax
        from graphsage_tpu.train.dist_trainer import (
            DistTrainConfig,
            DistTrainer,
        )
        n_dev = len(jax.devices())
        dcfg = DistTrainConfig(
            learn_method=args.learn_method, unsup_loss=args.unsup_loss,
            b_loc=max(1, args.b_sz // n_dev), epochs=args.epochs,
            lr=args.lr, fanout=args.fanout, seed=args.seed,
            clf_epochs=args.clf_epochs, verbose=not args.quiet,
            metrics_path=args.metrics)
        trainer = DistTrainer(ds, mcfg, dcfg, checkpoint_fn=checkpoint_fn)
    elif args.pipeline in ("cached", "cached_dist"):
        from graphsage_tpu.train import CachedDistTrainer, CachedTrainer
        cls = (CachedDistTrainer if args.pipeline == "cached_dist"
               else CachedTrainer)
        trainer = cls(ds, mcfg, tcfg, checkpoint_fn=checkpoint_fn,
                      table_cap=args.table_cap,
                      extend_batches=not args.no_extend,
                      lstm_hybrid=args.lstm_hybrid)
    else:
        trainer = Trainer(ds, mcfg, tcfg, checkpoint_fn=checkpoint_fn)
    trainer.max_vali_f1 = args.max_vali_f1

    if args.resume:
        from graphsage_tpu.utils.checkpoint import restore_checkpoint
        params, epoch, best_f1, rng, jax_key = restore_checkpoint(
            args.resume, trainer.params, with_jax_key=True)
        import jax.numpy as jnp
        import jax
        if jax_key is not None and hasattr(trainer, "_key"):
            # cached pipelines: restore the device PRNG so the resumed
            # run's in-jit sampling stream matches the unbroken run
            trainer._key = jnp.asarray(jax_key, dtype=jnp.uint32)
        if args.pipeline == "dist":
            # DistTrainer keeps params replicated over its mesh; restoring
            # them single-device would make the first sharded step resharded
            # (or fail on a true multi-host slice)
            from jax.sharding import NamedSharding, PartitionSpec
            trainer.params = jax.device_put(
                params, NamedSharding(trainer.mesh, PartitionSpec()))
        else:
            trainer.params = jax.tree_util.tree_map(jnp.asarray, params)
        # the checkpoint records the epoch it was written in; training
        # continues at the next one
        trainer.epoch = epoch + 1
        trainer.max_vali_f1 = best_f1
        trainer.rng = rng
        if not args.quiet:
            print(f"resumed from {args.resume} after epoch {epoch}, "
                  f"best val F1 {best_f1:.4f}")

    if args.learn_method == "sup":
        print("GraphSage with Supervised Learning")
    elif args.learn_method == "plus_unsup":
        print("GraphSage with Supervised Learning plus Net Unsupervised "
              "Learning")
    else:
        print("GraphSage with Net Unsupervised Learning")

    try:
        trainer.fit()
    except Exception as e:
        from graphsage_tpu.utils.obs import FetchDeadlineError
        if not isinstance(e, FetchDeadlineError):
            raise
        # the backend wedged a device fetch mid-run (diagnostics already
        # dumped by fetch_with_deadline).  The process is unrecoverable —
        # the wedged RPC thread cannot be joined, and normal interpreter
        # teardown aborts inside the backend plugin ("FATAL: exception not
        # rethrown", observed live) — so exit hard with a clean message
        # and a distinct code the operator/driver can react to.
        print(f"FATAL: {e}; restart and resume from the last checkpoint",
              flush=True)
        os._exit(17)
    print(f"Best validation F1: {trainer.max_vali_f1:.4f}")
    if args.export:
        from graphsage_tpu.infer import export_bundle
        export_params = best["params"]
        # run metadata in the artifact (the reference encodes
        # name/epoch/testF1 in its checkpoint path, src/utils.py:52)
        meta = {"dataset": ds.name, "name": args.name,
                "best_val_f1": float(trainer.max_vali_f1),
                "epoch": best["epoch"], "test_f1": best["test_f1"],
                "params": "best-val"}
        if (args.lstm_hybrid and args.agg_func == "LSTM"
                and args.pipeline in ("cached", "cached_dist")):
            # the trained topology is MEAN-at-layer-1 + LSTM above;
            # InferenceSession.from_bundle reads this and serves the
            # hybrid forward (the layer-0 LSTM cell is never trained)
            meta["lstm_hybrid"] = True
        if export_params is None:  # no improvement ever checkpointed
            export_params = trainer.params
            meta["params"] = "final-epoch"
        export_bundle(args.export, export_params, mcfg, ds.num_classes,
                      meta=meta)
        if not args.quiet:
            print(f"exported serving bundle to {args.export} "
                  f"({meta['params']} params)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
