"""Checkpointing with orbax: save AND resume.

The reference only saves — a whole-module ``torch.save`` on val improvement
(src/utils.py:52) with no load path anywhere (SURVEY §2 comp. 22).  Here a
checkpoint captures everything needed to resume a run bit-exactly at the
epoch boundary: model params, epoch, best-val F1, and the numpy sampler RNG
state (the host RNG drives neighbor sampling, walks, negatives, and batch
shuffling — SURVEY §3 RNG notes).
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
                    rng: np.random.RandomState) -> None:
    path = os.path.abspath(path)
    tree = {
        "params": jax.device_get(params),
        "epoch": np.asarray([epoch], dtype=np.int64),
        "max_vali_f1": np.asarray([max_vali_f1], dtype=np.float64),
        "rng": _rng_state_to_tree(rng.get_state()),
    }
    if not _HAS_ORBAX:
        raise RuntimeError("orbax-checkpoint is not available")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, params_like):
    """Restore (params, epoch, max_vali_f1, rng).  ``params_like`` provides
    the pytree structure/shapes (from a fresh init)."""
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
    tree = ckptr.restore(path, target=target)
    rng = np.random.RandomState(0)
    rng.set_state(_tree_to_rng_state(tree["rng"]))
    return (jax.tree_util.tree_map(np.asarray, tree["params"]),
            int(tree["epoch"][0]), float(tree["max_vali_f1"][0]), rng)
