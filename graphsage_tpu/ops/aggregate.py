"""Neighborhood aggregation ops (XLA path).

The reference's single real compute op is a dense-mask SpMM-as-GEMM:
build a ``[batch, union]`` 0/1 mask on host, row-normalize, ``mask.mm(embed)``
(reference src/models.py:305-314), and a Python per-row loop for MAX
(src/models.py:316-326).  Here aggregation is a **padded fixed-fanout
segment-reduce**: every output row owns exactly ``S`` index slots into the
previous layer's embedding matrix, with a validity/weight mask.  That shape
is static, gathers become one XLA `take`, and the reduce fuses into it —
no host work, no O(U·M) dense mask.

These XLA implementations are also the numerical oracles the Pallas TPU
kernels (graphsage_tpu.ops.pallas_aggregate) are unit-tested against.

Semantics notes (parity with the reference):
- MEAN divides by the number of *valid* neighbors (mask row-sum), exactly
  like ``mask.div(mask.sum(1))`` at src/models.py:312-313.  Rows with zero
  valid neighbors yield 0 (the reference would produce NaN via 0/0; isolated
  nodes do not occur in the shipped datasets, and 0 is the safe extension).
- MAX takes the max over valid slots only (−inf padding), matching the
  per-row ``torch.max(feat, 0)`` at src/models.py:321-325; zero-valid rows
  yield 0 (the reference errors on that case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(embed: jax.Array, idx: jax.Array) -> jax.Array:
    """``embed[idx]`` with an explicit op: [M, D] x [U, S] -> [U, S, D]."""
    return jnp.take(embed, idx, axis=0)


def sum_aggregate(embed: jax.Array, idx: jax.Array, mask: jax.Array,
                  ) -> jax.Array:
    """Masked-sum over fixed-fanout neighborhoods.

    embed: [M, D] previous-layer embeddings
    idx:   [U, S] int32 indices into embed (pad slots may hold any valid id)
    mask:  [U, S] weights; 0 for padding.  Returns [U, D].
    """
    gathered = gather_rows(embed, idx)            # [U, S, D]
    # f32 accumulation so a bf16 feature/embedding table (half the gather
    # bytes — the refresh cost at 1M-node scale) loses nothing in the sum
    total = jnp.einsum("usd,us->ud", gathered, mask.astype(embed.dtype),
                       preferred_element_type=jnp.float32)
    return total.astype(embed.dtype)


def mean_aggregate(embed: jax.Array, idx: jax.Array, mask: jax.Array,
                   ) -> jax.Array:
    """Masked-mean (reference MEAN aggregator, src/models.py:311-314)."""
    mask = mask.astype(embed.dtype)
    gathered = gather_rows(embed, idx)            # [U, S, D]
    total = jnp.einsum("usd,us->ud", gathered, mask,
                       preferred_element_type=jnp.float32)
    count = jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
    return (total / jnp.maximum(count, 1.0)).astype(embed.dtype)


def max_aggregate(embed: jax.Array, idx: jax.Array, mask: jax.Array,
                  ) -> jax.Array:
    """Masked-max (reference MAX aggregator, src/models.py:316-326)."""
    gathered = gather_rows(embed, idx)            # [U, S, D]
    neg_inf = jnp.asarray(-jnp.inf, dtype=embed.dtype)
    masked = jnp.where(mask[..., None] > 0, gathered, neg_inf)
    out = jnp.max(masked, axis=1)
    any_valid = jnp.any(mask > 0, axis=1, keepdims=True)
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def pair_cosine(embed: jax.Array, p_idx: jax.Array, q_idx: jax.Array,
                eps: float = 1e-8) -> jax.Array:
    """Cosine similarity of embedding pairs (SDDMM pattern).

    Matches ``F.cosine_similarity(embeddings[p], embeddings[q])`` used by
    both unsupervised losses (reference src/models.py:82,90,116,122),
    including torch's eps=1e-8 norm clamp.
    p_idx/q_idx: [...,] int32 into embed's rows.  Returns [...].
    """
    a = jnp.take(embed, p_idx, axis=0).astype(jnp.float32)
    b = jnp.take(embed, q_idx, axis=0).astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)
