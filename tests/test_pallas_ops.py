"""Pallas kernels vs the XLA oracle ops (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphsage_tpu.ops import max_aggregate, mean_aggregate
from graphsage_tpu.ops.pallas_aggregate import (
    pallas_max_aggregate,
    pallas_mean_aggregate,
)

from tests.test_ops import random_case


@pytest.mark.parametrize("kind", ["mean", "max"])
def test_pallas_matches_xla(rng, kind):
    embed, idx, mask = random_case(rng, u=37, s=11, m=53, d=19)
    e, i, m = jnp.asarray(embed), jnp.asarray(idx), jnp.asarray(mask)
    if kind == "mean":
        got = pallas_mean_aggregate(e, i, m, interpret=True)
        want = mean_aggregate(e, i, m)
    else:
        got = pallas_max_aggregate(e, i, m, interpret=True)
        want = max_aggregate(e, i, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["mean", "max"])
def test_pallas_grad_matches_xla(rng, kind):
    embed, idx, mask = random_case(rng, u=13, s=5, m=21, d=9)
    e, i, m = jnp.asarray(embed), jnp.asarray(idx), jnp.asarray(mask)

    if kind == "mean":
        f_p = lambda e: jnp.sum(jnp.sin(
            pallas_mean_aggregate(e, i, m, interpret=True)))
        f_x = lambda e: jnp.sum(jnp.sin(mean_aggregate(e, i, m)))
    else:
        f_p = lambda e: jnp.sum(jnp.sin(
            pallas_max_aggregate(e, i, m, interpret=True)))
        f_x = lambda e: jnp.sum(jnp.sin(max_aggregate(e, i, m)))

    g_p = np.asarray(jax.grad(f_p)(e))
    g_x = np.asarray(jax.grad(f_x)(e))
    np.testing.assert_allclose(g_p, g_x, rtol=1e-4, atol=1e-4)


def test_pallas_large_embed_falls_back(rng):
    # embedding block over the VMEM budget → must still give XLA semantics
    embed = rng.randn(90000, 64).astype(np.float32)  # 90000*128*4 > 10MB
    idx = rng.randint(0, 90000, (8, 4)).astype(np.int32)
    mask = np.ones((8, 4), np.float32)
    got = pallas_mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                                jnp.asarray(mask))
    want = mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_pallas_unaligned_shapes(rng):
    # u and d deliberately not multiples of tiles/lanes
    embed, idx, mask = random_case(rng, u=3, s=7, m=11, d=130)
    got = pallas_mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                                jnp.asarray(mask), interpret=True)
    want = mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
