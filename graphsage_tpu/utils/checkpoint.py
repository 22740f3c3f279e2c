"""Checkpointing with orbax: save AND resume.

The reference only saves — a whole-module ``torch.save`` on val improvement
(src/utils.py:52) with no load path anywhere (SURVEY §2 comp. 22).  Here a
checkpoint captures everything needed to resume a run bit-exactly at the
epoch boundary: model params, epoch, best-val F1, the numpy sampler RNG
state (the host RNG drives neighbor sampling, walks, negatives, and batch
shuffling — SURVEY §3 RNG notes), and — for the cached pipelines — the
device PRNG key that drives in-jit sampling and the leaf-cache draw.

Exactness scope — supervised runs: compact and cached/cached_dist resumes
replay the unbroken run bit-for-bit (tests/test_checkpoint.py), with ONE
documented exception — under ``refresh_every`` k > 1 a resume redraws the
leaf cache at the resumed epoch rather than reusing the (unsaved,
device-resident) stale cache from the last refresh epoch; quality-neutral
per STALENESS_r04.json, and the subsequent refresh schedule realigns at
the next multiple of k.

unsup/plus_unsup runs resume CORRECTLY but not bit-exactly: the
checkpoint is written mid-``train_classification`` (on val improvement),
after which the unbroken run keeps consuming the host RNG (clf batch
permutations) and, with ``strict_clf_eval``, the device key — a resume
restarts at the next epoch boundary with the mid-classification RNG
state, so the two streams diverge from there.  Making that path exact
would need the checkpoint to record its position inside the clf fit;
deliberately out of scope (the reference re-fits the classifier from
scratch every eval anyway, src/main.py protocol).
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked in normally
    _HAS_ORBAX = False


def _rng_state_to_tree(state: tuple) -> dict:
    # state[0] is always the algorithm name 'MT19937' for RandomState;
    # orbax StandardCheckpointer rejects strings, so it is implied.
    _name, keys, pos, has_gauss, cached = state
    return {
        "keys": np.asarray(keys, dtype=np.uint32),
        "pos": np.asarray([pos], dtype=np.int64),
        "has_gauss": np.asarray([has_gauss], dtype=np.int64),
        "cached_gaussian": np.asarray([cached], dtype=np.float64),
    }


def _tree_to_rng_state(tree: dict) -> tuple:
    return ("MT19937", np.asarray(tree["keys"], dtype=np.uint32),
            int(tree["pos"][0]), int(tree["has_gauss"][0]),
            float(tree["cached_gaussian"][0]))


def save_checkpoint(path: str, params, epoch: int, max_vali_f1: float,
                    rng: np.random.RandomState, jax_key=None) -> None:
    """``jax_key`` (optional): the trainer's device PRNG key
    (``CachedTrainer._key`` — drives in-jit sampling and the leaf-cache
    draw).  Checkpointing it makes the cached pipelines' resume bit-exact,
    not just the compact pipeline's (VERDICT r04 weak #5)."""
    path = os.path.abspath(path)
    tree = {
        "params": jax.device_get(params),
        "epoch": np.asarray([epoch], dtype=np.int64),
        "max_vali_f1": np.asarray([max_vali_f1], dtype=np.float64),
        "rng": _rng_state_to_tree(rng.get_state()),
    }
    if jax_key is not None:
        tree["jax_key"] = np.asarray(jax.device_get(jax_key),
                                     dtype=np.uint32)
    if not _HAS_ORBAX:
        raise RuntimeError("orbax-checkpoint is not available")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, params_like, with_jax_key: bool = False):
    """Restore (params, epoch, max_vali_f1, rng) — plus the saved jax key
    (or None) as a fifth element when ``with_jax_key`` is true.
    ``params_like`` provides the pytree structure/shapes (from a fresh
    init)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    # Only structure/shape/dtype are needed for the restore target — build
    # it host-side so restore never blocks on device transfers (on a remote
    # TPU backend, fetching freshly-initialized params can stall behind
    # queued eager compiles).
    abstract = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype), params_like)
    target = {
        "params": abstract,
        "epoch": np.asarray([0], dtype=np.int64),
        "max_vali_f1": np.asarray([0.0], dtype=np.float64),
        "rng": _rng_state_to_tree(np.random.RandomState(0).get_state()),
    }
    # A checkpoint may or may not carry the jax_key leaf (cached pipelines
    # save it, compact ones don't) and StandardCheckpointer rejects any
    # target/on-disk structure mismatch — probe the on-disk metadata for
    # the leaf and restore against the matching structure, so the common
    # paths never pay a guaranteed-failing restore (and a genuinely
    # corrupt checkpoint surfaces its real error, not a structure
    # mismatch from the wrong target).  The key is returned (or None)
    # only when asked for, discarded otherwise.
    t2 = dict(target)
    t2["jax_key"] = np.zeros(2, dtype=np.uint32)
    try:
        has_key = "jax_key" in ckptr.metadata(path).item_metadata
    except Exception:
        has_key = None  # metadata API unavailable: fall back to try-both
    if has_key is None:
        first, second = (t2, target) if with_jax_key else (target, t2)
        try:
            tree = ckptr.restore(path, target=first)
        except Exception:
            tree = ckptr.restore(path, target=second)
    else:
        tree = ckptr.restore(path, target=t2 if has_key else target)
    jax_key = (np.asarray(tree["jax_key"], dtype=np.uint32)
               if "jax_key" in tree else None)
    rng = np.random.RandomState(0)
    rng.set_state(_tree_to_rng_state(tree["rng"]))
    out = (jax.tree_util.tree_map(np.asarray, tree["params"]),
           int(tree["epoch"][0]), float(tree["max_vali_f1"][0]), rng)
    return out + (jax_key,) if with_jax_key else out
