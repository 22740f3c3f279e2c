"""Aggregation ops vs a dense-mask numpy oracle.

The oracle replicates the reference aggregate() exactly: dense 0/1 mask
[batch, union], row-normalize for MEAN (src/models.py:305-314), per-row max
over mask==1 rows for MAX (src/models.py:316-326)."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphsage_tpu.ops import (
    mean_aggregate,
    max_aggregate,
    sum_aggregate,
    pair_cosine,
)


def dense_mask_oracle(embed, idx, mask, kind):
    """Reference-semantics dense aggregation over padded index tables."""
    u, s = idx.shape
    m = embed.shape[0]
    dense = np.zeros((u, m), dtype=np.float64)
    for r in range(u):
        for c in range(s):
            if mask[r, c] > 0:
                dense[r, idx[r, c]] = 1.0  # set semantics: 0/1, not counts
    if kind == "mean":
        cnt = dense.sum(1, keepdims=True)
        cnt = np.maximum(cnt, 1.0)
        return (dense / cnt) @ embed.astype(np.float64)
    if kind == "sum":
        return dense @ embed.astype(np.float64)
    if kind == "max":
        out = np.zeros((u, embed.shape[1]))
        for r in range(u):
            rows = np.nonzero(dense[r])[0]
            if len(rows):
                out[r] = embed[rows].max(0)
        return out
    raise ValueError(kind)


def random_case(rng, u=37, s=11, m=53, d=19):
    embed = rng.randn(m, d).astype(np.float32)
    idx = rng.randint(0, m, size=(u, s)).astype(np.int32)
    mask = (rng.rand(u, s) < 0.7).astype(np.float32)
    # ensure no duplicate indices among valid slots within a row (our padded
    # tables come from without-replacement sampling, so rows never repeat ids)
    for r in range(u):
        seen = set()
        for c in range(s):
            if mask[r, c] and idx[r, c] in seen:
                mask[r, c] = 0.0
            seen.add(int(idx[r, c]))
    return embed, idx, mask


@pytest.mark.parametrize("kind,fn", [
    ("mean", mean_aggregate),
    ("max", max_aggregate),
    ("sum", sum_aggregate),
])
def test_aggregate_vs_dense_oracle(rng, kind, fn):
    embed, idx, mask = random_case(rng)
    got = np.asarray(fn(jnp.asarray(embed), jnp.asarray(idx),
                        jnp.asarray(mask)))
    want = dense_mask_oracle(embed, idx, mask, kind)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mean_zero_valid_row_is_zero(rng):
    embed = rng.randn(4, 3).astype(np.float32)
    idx = np.zeros((2, 5), np.int32)
    mask = np.zeros((2, 5), np.float32)
    out = np.asarray(mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                                    jnp.asarray(mask)))
    np.testing.assert_array_equal(out, np.zeros((2, 3)))
    out = np.asarray(max_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                                   jnp.asarray(mask)))
    np.testing.assert_array_equal(out, np.zeros((2, 3)))


def test_pair_cosine_matches_numpy(rng):
    emb = rng.randn(20, 8).astype(np.float32)
    p = rng.randint(0, 20, size=15).astype(np.int32)
    q = rng.randint(0, 20, size=15).astype(np.int32)
    got = np.asarray(pair_cosine(jnp.asarray(emb), jnp.asarray(p),
                                 jnp.asarray(q)))
    a, b = emb[p], emb[q]
    want = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                              * np.linalg.norm(b, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
