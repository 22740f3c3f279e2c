"""Training objectives as pure, fixed-shape jnp functions.

Reference semantics:
- supervised: hand-picked NLL over log_softmax logits,
  ``−Σ logists[range, labels] / len(batch)`` (src/utils.py:161-163);
- unsup "normal": per target node, mean over its positive pairs of
  −log σ(cos) plus −Q·mean over its negative pairs of log σ(−cos), averaged
  over nodes that have both kinds of pairs (src/models.py:65-98);
- unsup "margin": per node, relu(max_neg − min_pos + MARGIN) on
  log σ(cos) scores (src/models.py:100-132);
- plus_unsup: supervised + unsup summed (src/utils.py:165-175).

Variable-size pair sets become masked fixed-shape tensors (`PairBatch`);
means/min/max are computed under the masks, and nodes lacking a positive or
negative pair are excluded exactly as the reference's ``continue`` does
(src/models.py:75-76, 110-111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphsage_tpu.ops.aggregate import pair_cosine


def supervised_nll(log_probs: jax.Array, labels: jax.Array,
                   row_mask: jax.Array) -> jax.Array:
    """−mean over valid rows of log_probs[i, labels[i]]
    (reference src/utils.py:161-163; divisor = number of real batch rows).
    log_probs: [U, C]; labels: [U] int; row_mask: [U] float."""
    # one-hot pick instead of take_along_axis: same value, but the backward
    # is a dense multiply rather than a scatter (keeps training programs
    # scatter-free; C is tiny so the [U, C] one-hot costs nothing)
    onehot = (labels[:, None].astype(jnp.int32)
              == jnp.arange(log_probs.shape[1])[None, :])
    picked = jnp.sum(jnp.where(onehot, log_probs, 0.0),
                     axis=1).astype(jnp.float32)
    row_mask = row_mask.astype(jnp.float32)
    total = -jnp.sum(picked * row_mask)
    return total / jnp.maximum(jnp.sum(row_mask), 1.0)


def _masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    s = jnp.sum(x * mask, axis=axis)
    c = jnp.sum(mask, axis=axis)
    return s / jnp.maximum(c, 1.0)


def _unsup_loss_from_cosines(pos_cos, pos_mask, neg_cos, neg_mask,
                             node_valid, kind: str, q: float,
                             margin: float) -> jax.Array:
    """Shared per-node reductions over pair cosine scores.

    normal (reference src/models.py:65-98): per node
    mean_pos(−log σ(cos)) − Q·mean_neg(log σ(−cos)).  (The reference
    computes mean(−pos_vec − neg_scalar) = mean(−pos_vec) − neg_scalar.)
    margin (reference src/models.py:100-132): per node
    relu(max_neg − min_pos + margin) on log σ(cos) scores.
    Loss = mean over nodes with ≥1 valid pos and neg pair.
    Reductions run in float32 regardless of the embedding compute dtype.
    """
    pos_cos = pos_cos.astype(jnp.float32)
    neg_cos = neg_cos.astype(jnp.float32)
    pos_mask = pos_mask.astype(jnp.float32)
    neg_mask = neg_mask.astype(jnp.float32)
    node_valid = node_valid.astype(jnp.float32)
    if kind == "normal":
        pos_term = _masked_mean(-jax.nn.log_sigmoid(pos_cos), pos_mask, 1)
        neg_term = q * _masked_mean(jax.nn.log_sigmoid(-neg_cos),
                                    neg_mask, 1)
        per_node = pos_term - neg_term
    elif kind == "margin":
        big = jnp.asarray(1e30, pos_cos.dtype)
        pos_s = jax.nn.log_sigmoid(pos_cos)
        neg_s = jax.nn.log_sigmoid(neg_cos)
        pos_min = jnp.min(jnp.where(pos_mask > 0, pos_s, big), axis=1)
        neg_max = jnp.max(jnp.where(neg_mask > 0, neg_s, -big), axis=1)
        per_node = jax.nn.relu(neg_max - pos_min + margin)
    else:
        raise ValueError("unsup_loss can be only 'margin' or 'normal'.")
    return (jnp.sum(per_node * node_valid)
            / jnp.maximum(jnp.sum(node_valid), 1.0))


def unsup_loss_normal(embeddings: jax.Array, pos_p, pos_q, pos_mask,
                      neg_p, neg_q, neg_mask, node_valid,
                      q: float = 10.0) -> jax.Array:
    """Negative-sampling objective (reference src/models.py:65-98)."""
    pos_cos = pair_cosine(embeddings, pos_p, pos_q)      # [B, P]
    neg_cos = pair_cosine(embeddings, neg_p, neg_q)      # [B, M]
    return _unsup_loss_from_cosines(pos_cos, pos_mask, neg_cos, neg_mask,
                                    node_valid, "normal", q, 0.0)


def unsup_loss_margin(embeddings: jax.Array, pos_p, pos_q, pos_mask,
                      neg_p, neg_q, neg_mask, node_valid,
                      margin: float = 3.0) -> jax.Array:
    """Hinge objective (reference src/models.py:100-132)."""
    pos_cos = pair_cosine(embeddings, pos_p, pos_q)
    neg_cos = pair_cosine(embeddings, neg_p, neg_q)
    return _unsup_loss_from_cosines(pos_cos, pos_mask, neg_cos, neg_mask,
                                    node_valid, "margin", 0.0, margin)


def unsup_loss_from_pairbatch(embeddings: jax.Array, pb_tensors: dict,
                              kind: str, q: float = 10.0,
                              margin: float = 3.0) -> jax.Array:
    """Dispatch helper over jnp-converted PairBatch fields
    (reference dispatch src/utils.py:177-181).

    When ``target_rows`` is present in the tensors, pair scores come from
    ops/sddmm.py's dispatcher: the dense SDDMM block (one MXU matmul +
    scalar sampling) for compact-pipeline batches, the gathered per-pair
    formulation for large cached-pipeline batches where the block would
    be >99% wasted HBM traffic (PROFILE_UNSUP.json) — both exact, chosen
    by the byte-cost crossover in pair_loss_scores.
    """
    target_rows = pb_tensors.get("target_rows")
    if target_rows is not None:
        from graphsage_tpu.ops.sddmm import pair_loss_scores
        pos_cos, neg_cos = pair_loss_scores(
            embeddings, target_rows, pb_tensors["pos_q"],
            pb_tensors["neg_q"])
        return _unsup_loss_from_cosines(
            pos_cos, pb_tensors["pos_mask"], neg_cos,
            pb_tensors["neg_mask"], pb_tensors["node_valid"], kind, q,
            margin)

    args = (embeddings, pb_tensors["pos_p"], pb_tensors["pos_q"],
            pb_tensors["pos_mask"], pb_tensors["neg_p"], pb_tensors["neg_q"],
            pb_tensors["neg_mask"], pb_tensors["node_valid"])
    if kind == "normal":
        return unsup_loss_normal(*args, q=q)
    if kind == "margin":
        return unsup_loss_margin(*args, margin=margin)
    raise ValueError("unsup_loss can be only 'margin' or 'normal'.")
