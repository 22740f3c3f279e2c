"""SDDMM dense-score path: XLA block vs per-pair cosine, Pallas kernel vs
XLA block, and loss equivalence between gather and dense formulations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.losses import unsup_loss_from_pairbatch
from graphsage_tpu.ops.aggregate import pair_cosine
from graphsage_tpu.ops.sddmm import (
    dense_pair_scores,
    pallas_pair_scores,
    sample_scores,
)


def test_dense_scores_match_pair_cosine(rng):
    u, h, b = 50, 16, 7
    emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
    targets = jnp.asarray(rng.choice(u, b, replace=False).astype(np.int32))
    scores = dense_pair_scores(emb, targets)
    q = jnp.asarray(rng.randint(0, u, (b, 9)).astype(np.int32))
    got = sample_scores(scores, q)
    p = jnp.broadcast_to(targets[:, None], q.shape)
    want = pair_cosine(emb, p, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_scores_match_xla(rng):
    u, h, b = 130, 40, 12  # unaligned on purpose
    emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
    targets = jnp.asarray(rng.choice(u, b, replace=False).astype(np.int32))
    got = pallas_pair_scores(emb, targets, interpret=True)
    want = dense_pair_scores(emb, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["normal", "margin"])
def test_loss_dense_matches_gather(rng, kind):
    u, h, b = 64, 8, 6
    emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
    targets = rng.choice(u, b, replace=False).astype(np.int32)
    pos_q = rng.randint(0, u, (b, 4)).astype(np.int32)
    neg_q = rng.randint(0, u, (b, 9)).astype(np.int32)
    pos_p = np.broadcast_to(targets[:, None], pos_q.shape).copy()
    neg_p = np.broadcast_to(targets[:, None], neg_q.shape).copy()
    pos_mask = (rng.rand(b, 4) < 0.8).astype(np.float32)
    neg_mask = (rng.rand(b, 9) < 0.8).astype(np.float32)
    node_valid = ((pos_mask.sum(1) > 0) & (neg_mask.sum(1) > 0)
                  ).astype(np.float32)
    base = {
        "pos_p": jnp.asarray(pos_p), "pos_q": jnp.asarray(pos_q),
        "pos_mask": jnp.asarray(pos_mask), "neg_p": jnp.asarray(neg_p),
        "neg_q": jnp.asarray(neg_q), "neg_mask": jnp.asarray(neg_mask),
        "node_valid": jnp.asarray(node_valid),
    }
    gather_loss = float(unsup_loss_from_pairbatch(emb, base, kind))
    dense = dict(base, target_rows=jnp.asarray(targets))
    dense_loss = float(unsup_loss_from_pairbatch(emb, dense, kind))
    np.testing.assert_allclose(dense_loss, gather_loss, rtol=1e-5)


def test_pallas_scores_analytic_bwd_matches_autodiff():
    """The custom VJP used under the TPU pair_scores dispatcher
    (ops/sddmm._pallas_scores_bwd) must match the autodiff of the XLA
    oracle dense_pair_scores."""
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.ops.sddmm import _pallas_scores_bwd, dense_pair_scores

    rng = np.random.RandomState(7)
    u, h, b = 64, 16, 12
    emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, u, b).astype(np.int32))
    # duplicate targets exercise the .add accumulation
    targets = targets.at[1].set(targets[0])
    g = jnp.asarray(rng.randn(b, u).astype(np.float32))

    _, vjp = jax.vjp(lambda e: dense_pair_scores(e, targets), emb)
    want = vjp(g)[0]

    eps = 1e-8
    norms = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), eps)
    unit = emb / norms
    got, _ = _pallas_scores_bwd(eps, (unit, norms, targets,
                                      jnp.zeros((0,), emb.dtype)), g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gathered_pair_cosines_match_dense(rng):
    """The large-batch gathered formulation (no [B, U] block) must match
    the dense block scores and their gradients (VERDICT r2 item 3)."""
    from graphsage_tpu.ops.sddmm import gathered_pair_cosines

    u, h, b = 96, 24, 10
    emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
    targets = jnp.asarray(rng.choice(u, b, replace=False).astype(np.int32))
    pos_q = jnp.asarray(rng.randint(0, u, (b, 3)).astype(np.int32))
    neg_q = jnp.asarray(rng.randint(0, u, (b, 7)).astype(np.int32))

    def loss_dense(e):
        s = dense_pair_scores(e, targets)
        return (jnp.sum(sample_scores(s, pos_q) ** 2)
                + jnp.sum(sample_scores(s, neg_q) ** 2))

    def loss_gathered(e):
        p, n = gathered_pair_cosines(e, targets, pos_q, neg_q)
        return jnp.sum(p ** 2) + jnp.sum(n ** 2)

    lw, gw = jax.value_and_grad(loss_dense)(emb)
    lg, gg = jax.value_and_grad(loss_gathered)(emb)
    np.testing.assert_allclose(float(lg), float(lw), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=1e-4, atol=1e-5)


def test_pair_loss_scores_dispatch(rng):
    """pair_loss_scores picks the gathered path for large B·U and the
    dense block for small, with identical results either way."""
    from graphsage_tpu.ops.sddmm import (
        gathered_pair_cosines,
        pair_loss_scores,
    )

    h = 8
    for u, b in ((2048, 512), (64, 6)):  # large -> gathered, small -> block
        emb = jnp.asarray(rng.randn(u, h).astype(np.float32))
        targets = jnp.asarray(rng.choice(u, b, replace=False)
                              .astype(np.int32))
        pos_q = jnp.asarray(rng.randint(0, u, (b, 2)).astype(np.int32))
        neg_q = jnp.asarray(rng.randint(0, u, (b, 5)).astype(np.int32))
        got_p, got_n = pair_loss_scores(emb, targets, pos_q, neg_q)
        want_p, want_n = gathered_pair_cosines(emb, targets, pos_q, neg_q)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                                   rtol=1e-5, atol=1e-6)


def test_dense_scores_preserve_input_dtype():
    """The oracle must return the INPUT dtype like the Pallas path does —
    it used to shadow `emb` with its f32 cast, so the final astype was a
    no-op and CPU/TPU loss math ran in different precisions."""
    emb = jnp.asarray(np.random.RandomState(0).randn(12, 8),
                      dtype=jnp.bfloat16)
    t = jnp.asarray([0, 3, 5], dtype=jnp.int32)
    assert dense_pair_scores(emb, t).dtype == jnp.bfloat16
    assert dense_pair_scores(emb.astype(jnp.float32), t).dtype == jnp.float32
