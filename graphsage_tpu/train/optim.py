"""Optimizer: SGD with per-model global-norm gradient clipping.

Reference: plain ``torch.optim.SGD`` (lr 0.7 joint / 0.5 classifier-only,
src/utils.py:136, 82) with ``clip_grad_norm_(model.parameters(), 5)`` applied
**per model** before the step (src/utils.py:185-186, 106).  Implemented as
pure pytree transforms so the update fuses into the jit'd train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics: scale all grads by
    max_norm / (norm + 1e-6) when norm > max_norm."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), tree)


def sgd_update(params, grads, lr: float):
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
