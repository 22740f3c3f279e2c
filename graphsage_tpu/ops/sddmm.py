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
    out_dtype = emb.dtype  # before the f32 cast shadows it: the oracle
    # must return the INPUT dtype, like the Pallas path, or the two
    # platforms' loss math would run in different precisions
    emb = emb.astype(jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), eps)
    unit = emb / norms
    targets = jnp.take(unit, target_rows, axis=0)        # [B, H]
    return jnp.dot(targets, unit.T, preferred_element_type=jnp.float32
                   ).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pallas_scores_diff(emb, target_rows, eps):
    return pallas_pair_scores(emb, target_rows, eps=eps, interpret=False)


def _pallas_scores_fwd(emb, target_rows, eps):
    scores = pallas_pair_scores(emb, target_rows, eps=eps, interpret=False)
    # residuals for the analytic backward: the normalized embeddings
    emb32 = emb.astype(jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(emb32, axis=-1, keepdims=True), eps)
    unit = emb32 / norms
    # dtype token: residuals must be JAX types, so carry an empty array
    return scores, (unit, norms, target_rows, jnp.zeros((0,), emb.dtype))


def _pallas_scores_bwd(eps, res, g):
    """S = unit[t] @ unit.T; chain through the row normalization:
    d_emb = (d_unit − unit·(d_unit⊙unit).sum(-1)) / norms."""
    unit, norms, target_rows, dtype_token = res
    in_dtype = dtype_token.dtype
    g = g.astype(jnp.float32)
    a = jnp.take(unit, target_rows, axis=0)               # [B, H]
    d_unit = jnp.dot(g.T, a, preferred_element_type=jnp.float32)  # [U, H]
    d_a = jnp.dot(g, unit, preferred_element_type=jnp.float32)    # [B, H]
    d_unit = d_unit.at[target_rows].add(d_a)
    proj = jnp.sum(d_unit * unit, axis=-1, keepdims=True)
    d_emb = (d_unit - unit * proj) / norms
    return (d_emb.astype(in_dtype), None)


_pallas_scores_diff.defvjp(_pallas_scores_fwd, _pallas_scores_bwd)


def pair_scores(emb: jax.Array, target_rows: jax.Array,
                eps: float = 1e-8) -> jax.Array:
    """Production dispatcher for the [B, U] score block: the Pallas fused
    normalize+matmul kernel on TPU (measured 15% faster than the XLA path
    at the production shape — PALLAS_MICROBENCH.json, pair_scores rows)
    with an analytic custom VJP; the XLA oracle elsewhere (interpret-mode
    Pallas is slow on CPU).  Gradient parity is tested in
    tests/test_sddmm.py."""
    from graphsage_tpu.ops.backend import on_tpu
    if on_tpu():
        return _pallas_scores_diff(emb, target_rows, eps)
    return dense_pair_scores(emb, target_rows, eps=eps)


def sample_scores(scores: jax.Array, q_idx: jax.Array) -> jax.Array:
    """Gather per-pair scalars out of the dense block: [B, U] x [B, P]
    -> [B, P]."""
    return jnp.take_along_axis(scores, q_idx, axis=1)


def gathered_pair_cosines(emb: jax.Array, target_rows: jax.Array,
                          pos_q: jax.Array, neg_q: jax.Array,
                          eps: float = 1e-8):
    """Per-pair cosine scores WITHOUT the dense [B, U] block:
    normalize once, gather the pair rows, batched dot.

    [U, H] x [B] x [B, P] x [B, M] -> ([B, P], [B, M]).

    Cost ∝ pairs·H (gather + elementwise), vs the dense block's
    ≥3·B·U floats of HBM traffic (fwd write, backward scatter of the
    take_along_axis grad, two [B,U]·[U,H] GEMMs).  At the cached
    pipeline's production shape (B=4096, U=32768, 26 pairs/target) the
    block uses 0.08% of the scores it materializes — this formulation is
    ~5x cheaper there (PROFILE_UNSUP.json).  The dense block stays optimal
    for the compact pipeline's tiny batches (B≈20, U≈2048), where one
    MXU matmul beats 26 gathers; `pair_loss_scores` dispatches on the
    byte-cost crossover.  Same math as dense_pair_scores + sample_scores
    (reference cosine pair scores, src/models.py:82,90)."""
    emb32 = emb.astype(jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(emb32, axis=-1, keepdims=True), eps)
    # unit stays f32: a bf16 unit table was measured at parity (13.4 vs
    # 13.2 ms/step) — the block is bound by the backward row scatter-add,
    # not gather bytes — so keep full precision
    unit = emb32 / norms                                   # [U, H]
    t = jnp.take(unit, target_rows, axis=0)                # [B, H]
    pos = jnp.take(unit, pos_q.reshape(-1), axis=0).reshape(
        (*pos_q.shape, emb.shape[1]))                      # [B, P, H]
    neg = jnp.take(unit, neg_q.reshape(-1), axis=0).reshape(
        (*neg_q.shape, emb.shape[1]))                      # [B, M, H]
    pos_cos = jnp.einsum("bh,bph->bp", t, pos,
                         preferred_element_type=jnp.float32)
    neg_cos = jnp.einsum("bh,bmh->bm", t, neg,
                         preferred_element_type=jnp.float32)
    return pos_cos.astype(emb.dtype), neg_cos.astype(emb.dtype)


def pair_loss_scores(emb: jax.Array, target_rows: jax.Array,
                     pos_q: jax.Array, neg_q: jax.Array,
                     eps: float = 1e-8):
    """Production dispatcher for per-pair cosines: the dense SDDMM block
    when it is cheap (small B·U — compact-pipeline batches), the gathered
    formulation when the block would be mostly wasted traffic (large
    cached-pipeline batches).  Crossover by the HBM byte model: block
    traffic ≈ 3·B·U·4 bytes vs gathered ≈ 3·pairs·H·4 bytes (fwd gather,
    bwd scatter, unit-table pass)."""
    b = target_rows.shape[0]
    u = emb.shape[0]
    n_pairs = pos_q.shape[0] * pos_q.shape[1] + neg_q.shape[0] * neg_q.shape[1]
    if 3 * b * u <= 3 * n_pairs * emb.shape[1] + u * emb.shape[1]:
        scores = pair_scores(emb, target_rows, eps=eps)
        return sample_scores(scores, pos_q), sample_scores(scores, neg_q)
    return gathered_pair_cosines(emb, target_rows, pos_q, neg_q, eps=eps)


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
        from graphsage_tpu.ops.backend import on_tpu
        interpret = not on_tpu()
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
