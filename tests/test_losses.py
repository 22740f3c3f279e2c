"""Losses vs explicit numpy oracles of the reference formulae
(src/models.py:65-132, src/utils.py:159-163)."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphsage_tpu.losses import (
    supervised_nll,
    unsup_loss_margin,
    unsup_loss_normal,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def cos(a, b):
    return (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-8)


def make_pairs(rng, b=6, u=40, p=4, m=9):
    emb = rng.randn(u, 16).astype(np.float32)
    pos_p = rng.randint(0, u, (b, p)).astype(np.int32)
    pos_q = rng.randint(0, u, (b, p)).astype(np.int32)
    neg_p = rng.randint(0, u, (b, m)).astype(np.int32)
    neg_q = rng.randint(0, u, (b, m)).astype(np.int32)
    pos_mask = (rng.rand(b, p) < 0.7).astype(np.float32)
    neg_mask = (rng.rand(b, m) < 0.7).astype(np.float32)
    node_valid = ((pos_mask.sum(1) > 0) & (neg_mask.sum(1) > 0)
                  ).astype(np.float32)
    return emb, pos_p, pos_q, pos_mask, neg_p, neg_q, neg_mask, node_valid


def test_unsup_normal_matches_reference_formula(rng):
    emb, pp, pq, pm, np_, nq, nm, nv = make_pairs(rng)
    got = float(unsup_loss_normal(jnp.asarray(emb), pp, pq, pm,
                                  np_, nq, nm, nv, q=10.0))
    # oracle: per node mean(−log σ(pos_cos)) − Q·mean(log σ(−neg_cos)),
    # mean over valid nodes (src/models.py:78-96)
    scores = []
    for i in range(len(nv)):
        if nv[i] == 0:
            continue
        pos = [ -np.log(sigmoid(cos(emb[pp[i, j]], emb[pq[i, j]])))
                for j in range(pp.shape[1]) if pm[i, j] > 0]
        neg = [np.log(sigmoid(-cos(emb[np_[i, j]], emb[nq[i, j]])))
               for j in range(np_.shape[1]) if nm[i, j] > 0]
        scores.append(np.mean(pos) - 10.0 * np.mean(neg))
    np.testing.assert_allclose(got, np.mean(scores), rtol=1e-4)


def test_unsup_margin_matches_reference_formula(rng):
    emb, pp, pq, pm, np_, nq, nm, nv = make_pairs(rng)
    got = float(unsup_loss_margin(jnp.asarray(emb), pp, pq, pm,
                                  np_, nq, nm, nv, margin=3.0))
    scores = []
    for i in range(len(nv)):
        if nv[i] == 0:
            continue
        pos = [np.log(sigmoid(cos(emb[pp[i, j]], emb[pq[i, j]])))
               for j in range(pp.shape[1]) if pm[i, j] > 0]
        neg = [np.log(sigmoid(cos(emb[np_[i, j]], emb[nq[i, j]])))
               for j in range(np_.shape[1]) if nm[i, j] > 0]
        scores.append(max(0.0, max(neg) - min(pos) + 3.0))
    np.testing.assert_allclose(got, np.mean(scores), rtol=1e-4)


def test_supervised_nll(rng):
    u, c = 10, 4
    logits = rng.randn(u, c).astype(np.float32)
    logp = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
    labels = rng.randint(0, c, u).astype(np.int32)
    mask = np.ones(u, np.float32)
    mask[7:] = 0  # 3 padding rows
    got = float(supervised_nll(jnp.asarray(logp), jnp.asarray(labels),
                               jnp.asarray(mask)))
    want = -np.mean([logp[i, labels[i]] for i in range(7)])
    np.testing.assert_allclose(got, want, rtol=1e-5)
