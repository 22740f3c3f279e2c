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


def test_pallas_wide_feature_dim_covers_tail_tile(rng):
    """d between one and two feature tiles (e.g. 600 -> d_pad 640 over
    tile_d 512) must not truncate the grid: columns >= 512 were left
    unwritten before the grid padded d up to a tile multiple."""
    embed, idx, mask = random_case(rng, u=16, s=5, m=64, d=600)
    got = pallas_mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                                jnp.asarray(mask), interpret=True)
    want = mean_aggregate(jnp.asarray(embed), jnp.asarray(idx),
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the tail columns specifically
    np.testing.assert_allclose(np.asarray(got)[:, 512:],
                               np.asarray(want)[:, 512:],
                               rtol=1e-5, atol=1e-5)


def test_pallas_sub32bit_dtype_falls_back_on_tpu(rng):
    """Mosaic cannot prove the dynamic row-slice alignment 16-bit tiles
    need, so a bf16 embed must route to the XLA op on real TPU (it would
    otherwise crash at compile time) — and still give XLA semantics."""
    from graphsage_tpu.ops.pallas_aggregate import _must_fall_back

    embed, idx, mask = random_case(rng, u=8, s=4, m=32, d=128)
    e16 = jnp.asarray(embed, dtype=jnp.bfloat16)
    assert _must_fall_back(e16, interpret=False)
    assert not _must_fall_back(jnp.asarray(embed), interpret=False)
    assert not _must_fall_back(e16, interpret=True)  # CPU tests keep
    # exercising the kernel in interpret mode
    got = pallas_mean_aggregate(e16, jnp.asarray(idx), jnp.asarray(mask),
                                interpret=False)
    want = mean_aggregate(e16, jnp.asarray(idx), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32))


def test_explicit_pallas_impl_disables_mean_pretransform():
    """impl='pallas' must actually run the Pallas aggregate: the MEAN
    pretransform restructures layers to avoid aggregates entirely, which
    used to silently bypass the requested kernels."""
    from graphsage_tpu.models.graphsage import (
        Frontier,
        GraphSageConfig,
        _use_pretransform,
    )

    h = jnp.zeros((8, 16), jnp.float32)
    f = Frontier(idx=jnp.zeros((64, 4), jnp.int32),
                 mask=jnp.ones((64, 4), jnp.float32),
                 self_idx=jnp.zeros((64,), jnp.int32))
    cfg_x = GraphSageConfig(num_layers=2, input_size=16, out_size=16,
                            mean_pretransform="always")
    cfg_p = GraphSageConfig(num_layers=2, input_size=16, out_size=16,
                            mean_pretransform="always", impl="pallas")
    assert _use_pretransform(cfg_x, h, f)
    assert not _use_pretransform(cfg_p, h, f)
