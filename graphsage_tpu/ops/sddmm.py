"""SDDMM-style pairwise cosine scores, the MXU formulation.

The unsupervised losses need cos(emb[target], emb[q]) for every
(target, positive/negative) pair (reference src/models.py:82,90,116,122).
Per-pair gathers are memory-bound scalar work; but every pair's left side
is one of the B ≤ batch-size *targets*, so the TPU-native shape is a dense
score block:

    scores[i, u] = cos(emb[target_i], emb[u])     # [B, U]

i.e. row-normalize once and do one [B, H]·[H, U] MXU matmul — microFLOPs at
these sizes — then the losses *sample* scalar scores out of the block with
`take_along_axis`.  This is the sampled-dense-dense-matmul (SDDMM) pattern
with the sampling moved after the matmul, which on TPU is strictly faster
whenever B·U ≲ total pair count × H (always true here: B=20, U≈2048,
pairs≈2000).

`pallas_pair_scores` fuses the normalization into the matmul tiles so the
normalized matrix is never materialized in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_pair_scores(emb: jax.Array, target_rows: jax.Array,
                      eps: float = 1e-8) -> jax.Array:
    """[U, H] x [B] -> [B, U] cosine scores (XLA path; the oracle).
    Normalization runs in float32 even under bf16 compute."""
    emb = emb.astype(jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), eps)
    unit = emb / norms
    targets = jnp.take(unit, target_rows, axis=0)        # [B, H]
    return jnp.dot(targets, unit.T, preferred_element_type=jnp.float32
                   ).astype(emb.dtype)


def sample_scores(scores: jax.Array, q_idx: jax.Array) -> jax.Array:
    """Gather per-pair scalars out of the dense block: [B, U] x [B, P]
    -> [B, P]."""
    return jnp.take_along_axis(scores, q_idx, axis=1)


# ------------------------------------------------------------------ pallas
def _scores_kernel(t_ref, e_ref, out_ref, *, eps):
    t = t_ref[:].astype(jnp.float32)                     # [TB, H]
    e = e_ref[:].astype(jnp.float32)                     # [TU, H]
    t_unit = t / jnp.maximum(
        jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True)), eps)
    e_unit = e / jnp.maximum(
        jnp.sqrt(jnp.sum(e * e, axis=1, keepdims=True)), eps)
    out_ref[:] = jnp.dot(t_unit, e_unit.T,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def pallas_pair_scores(emb: jax.Array, target_rows: jax.Array,
                       eps: float = 1e-8,
                       interpret: bool | None = None) -> jax.Array:
    """Fused normalize+matmul score block on the MXU: [B, U]."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:
            interpret = True
    u, h = emb.shape
    b = target_rows.shape[0]
    tb = min(128, max(8, b))
    tu = 256
    b_pad = int(np.ceil(b / tb) * tb)
    u_pad = int(np.ceil(u / tu) * tu)
    h_pad = int(np.ceil(h / 128) * 128)

    emb_p = jnp.pad(emb, ((0, u_pad - u), (0, h_pad - h)))
    targets = jnp.take(emb_p, jnp.pad(target_rows, (0, b_pad - b)), axis=0)

    out = pl.pallas_call(
        functools.partial(_scores_kernel, eps=eps),
        grid=(b_pad // tb, u_pad // tu),
        in_specs=[
            pl.BlockSpec((tb, h_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, h_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tu), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, u_pad), emb.dtype),
        interpret=interpret,
    )(targets, emb_p)
    return out[:b, :u]
