"""Dense layers: SageLayer and the classification head.

Functional style: parameters are plain pytrees (dicts of jnp arrays),
`apply` functions are pure — the idiomatic JAX shape for code that lives
under `jit` / `grad` / `shard_map`.

Reference semantics:
- SageLayer (reference src/models.py:189-220): weight W ∈ [out, 2·in]
  (or [out, in] in gcn mode), xavier-uniform init, **no bias**; forward is
  relu(W @ concat([self, agg]).T).T — here written as x @ W.T which XLA maps
  to a single MXU matmul with the relu fused.
- Classification (reference src/models.py:8-27): Linear(emb → classes) with
  bias, xavier-uniform on the 2-D weight only (src/models.py:20-23, bias
  keeps torch Linear's default U(±1/sqrt(fan_in)) init), then log_softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(key: jax.Array, shape: tuple[int, int],
                   dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.xavier_uniform_ semantics for a 2-D weight [out, in]:
    U(−a, a) with a = sqrt(6 / (fan_in + fan_out)), fan_in = shape[1],
    fan_out = shape[0]."""
    fan_out, fan_in = shape
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-a, maxval=a)


def init_sage_layer(key: jax.Array, input_size: int, out_size: int,
                    gcn: bool = False, dtype=jnp.float32) -> dict:
    in_total = input_size if gcn else 2 * input_size
    return {"weight": xavier_uniform(key, (out_size, in_total), dtype)}


def mean_pretransform(w: jax.Array, h: jax.Array,
                      gcn: bool = False) -> jax.Array:
    """Transform-first half of the MEAN pretransform: z = h · W_partᵀ.

    The mean is linear, so relu(W·[self ‖ mean(neigh)]) can be computed as
    relu(mean(z_agg[neigh]) + z_self[self]) with the table transformed
    ONCE — D/H x less gather traffic (models/graphsage.py rationale;
    reference semantics src/models.py:209-220 + :311-314).  Returns
    [N, H] for gcn, else [N, 2H] with the SELF columns in ``[:, :H]`` and
    the AGG columns in ``[:, H:]`` — the one column convention every
    caller (dense forward, pretransform layers, serving, the sharded
    epoch, the halo step) must agree on, defined here exactly once.
    ``w`` is the sage layer's [H, 2D] (or [H, D] gcn) weight."""
    if gcn:
        return jnp.dot(h, w.T, preferred_element_type=jnp.float32
                       ).astype(h.dtype)
    d = h.shape[1]
    w_stack = jnp.concatenate([w[:, :d], w[:, d:]], axis=0)  # [2H, D]
    return jnp.dot(h, w_stack.T, preferred_element_type=jnp.float32
                   ).astype(h.dtype)


def sage_layer_apply(params: dict, self_feats: jax.Array,
                     agg_feats: jax.Array, gcn: bool = False) -> jax.Array:
    """relu(concat([self ‖ agg]) @ W.T); gcn mode drops the concat
    (reference src/models.py:209-220)."""
    if gcn:
        combined = agg_feats
    else:
        combined = jnp.concatenate([self_feats, agg_feats], axis=-1)
    w = params["weight"]
    out = jnp.dot(combined, w.T, preferred_element_type=jnp.float32)
    return jax.nn.relu(out).astype(combined.dtype)


def init_classifier(key: jax.Array, emb_size: int, num_classes: int,
                    dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / float(np.sqrt(emb_size))
    return {
        "weight": xavier_uniform(kw, (num_classes, emb_size), dtype),
        "bias": jax.random.uniform(kb, (num_classes,), dtype,
                                   minval=-bound, maxval=bound),
    }


def classifier_apply(params: dict, embeds: jax.Array) -> jax.Array:
    """log_softmax(Linear(embeds)) — reference src/models.py:25-27."""
    logits = jnp.dot(embeds, params["weight"].T,
                     preferred_element_type=jnp.float32) + params["bias"]
    return jax.nn.log_softmax(logits, axis=-1).astype(embeds.dtype)
