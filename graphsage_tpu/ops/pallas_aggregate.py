"""Pallas TPU kernels: fused gather + segment-reduce aggregation.

The XLA path (ops/aggregate.py) lowers to gather → materialized [U, S, D]
intermediate → reduce: 3x the optimal HBM traffic.  These kernels fuse the
gather and the masked reduction in VMEM, so each embedding row is read once
and the [U, S, D] intermediate never exists — the TPU-native equivalent of
the reference's single ``mask.mm(embed_matrix)`` GEMM (src/models.py:314)
without the O(U·M) dense mask.

Layout: grid over (U tiles × D tiles); the embedding matrix is blocked on
the feature dim only and resident in VMEM per tile; the index/mask tables
ride in SMEM (scalar memory) because the kernel reads them as scalars to
drive dynamic row slices.

Backward passes route through a custom VJP: d(embed) is a segment
scatter-add which XLA already emits optimally (one fused scatter), so the
VJP recomputes nothing and stays allocation-minimal.

Kernels auto-fallback to the XLA ops when the embedding block would not fit
VMEM or when running on a non-TPU backend (interpret mode covers tests).

MEASURED VERDICT (round 2, TPU v5e — PALLAS_MICROBENCH.json): these
kernels run at parity with the XLA path (3.78 vs 3.72 ms at the
[45k, 11] x [100k, 128] shape) because both are bound by per-row dynamic
addressing (~170M rows/s), which a Pallas per-row-DMA pipeline measures
6x WORSE at (DMA-issue bound, ~34 ns/copy).  They therefore stay OFF by
default (`GraphSageConfig.impl="xla"`); the production speedup came from
removing the hot gathers structurally (train/cached.py).  Kept as working,
tested reference kernels; see ops/sddmm.pair_scores for the Pallas kernel
that does win and ships on by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphsage_tpu.ops import aggregate as xla_agg
from graphsage_tpu.ops.backend import on_tpu as _on_tpu

# VMEM budget for the embedding block (bytes); v5e has ~16 MB/core.
_VMEM_EMBED_BUDGET = 10 * 1024 * 1024
_LANE = 128


def _pad_to(x: jax.Array, size: int, axis: int, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _mean_kernel(idx_ref, mask_ref, embed_ref, out_ref, *, tile_u, slots):
    def row(r, _):
        acc = jnp.zeros((1, out_ref.shape[1]), jnp.float32)
        cnt = jnp.float32(0.0)
        for s in range(slots):  # static unroll over fanout slots
            i = idx_ref[r, s]
            w = mask_ref[r, s].astype(jnp.float32)
            acc += w * embed_ref[pl.ds(i, 1), :].astype(jnp.float32)
            cnt += w
        out_ref[pl.ds(r, 1), :] = (acc / jnp.maximum(cnt, 1.0)).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile_u, row, 0)


def _max_kernel(idx_ref, mask_ref, embed_ref, out_ref, *, tile_u, slots):
    def row(r, _):
        neg = jnp.full((1, out_ref.shape[1]), -jnp.inf, jnp.float32)
        acc = neg
        any_w = jnp.float32(0.0)
        for s in range(slots):
            i = idx_ref[r, s]
            w = mask_ref[r, s].astype(jnp.float32)
            vals = embed_ref[pl.ds(i, 1), :].astype(jnp.float32)
            acc = jnp.where(w > 0, jnp.maximum(acc, vals), acc)
            any_w = jnp.maximum(any_w, w)
        acc = jnp.where(any_w > 0, acc, jnp.zeros_like(acc))
        out_ref[pl.ds(r, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile_u, row, 0)


def _pallas_aggregate_fwd(embed, idx, mask, kind: str, interpret: bool):
    u, s = idx.shape
    m, d = embed.shape
    tile_u = 8
    d_pad = int(np.ceil(d / _LANE) * _LANE)
    tile_d = min(d_pad, 512)
    # pad the feature dim up to a MULTIPLE of the tile: the grid below is
    # an exact division, and a remainder (e.g. d=600 -> d_pad=640 over
    # tile_d=512) would silently drop the tail tile, leaving columns
    # >= tile_d unwritten
    d_pad = int(np.ceil(d_pad / tile_d) * tile_d)
    u_pad = int(np.ceil(u / tile_u) * tile_u)

    embed_p = _pad_to(embed, d_pad, axis=1)
    idx_p = _pad_to(idx, u_pad, axis=0)
    mask_p = _pad_to(mask, u_pad, axis=0)

    kern = _mean_kernel if kind == "mean" else _max_kernel
    out = pl.pallas_call(
        functools.partial(kern, tile_u=tile_u, slots=s),
        grid=(u_pad // tile_u, d_pad // tile_d),
        in_specs=[
            pl.BlockSpec((tile_u, s), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_u, s), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, tile_d), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_u, tile_d), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((u_pad, d_pad), embed.dtype),
        interpret=interpret,
    )(idx_p, mask_p, embed_p)
    return out[:u, :d]


def _fits_vmem(embed, extra_cols: int = 512) -> bool:
    m, d = embed.shape
    tile_d = min(int(np.ceil(d / _LANE) * _LANE), extra_cols)
    return m * tile_d * embed.dtype.itemsize <= _VMEM_EMBED_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_mean(embed, idx, mask, interpret, _tag):
    return _pallas_aggregate_fwd(embed, idx, mask, "mean", interpret)


def _pallas_mean_fwd(embed, idx, mask, interpret, _tag):
    out = _pallas_aggregate_fwd(embed, idx, mask, "mean", interpret)
    return out, (embed, idx, mask)


def _pallas_mean_bwd(interpret, _tag, res, g):
    embed, idx, mask = res
    # d/d(embed): scatter-add of g rows weighted by mask/count — XLA emits
    # this as one fused scatter, already optimal.  ``embed`` is only used
    # for shape/dtype (the live buffer is aliased, no extra memory).
    cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    w = (mask / cnt).astype(g.dtype)                      # [U, S]
    contrib = g[:, None, :] * w[:, :, None]               # [U, S, D]
    d_embed = jnp.zeros_like(embed).at[idx.reshape(-1)].add(
        contrib.reshape(-1, embed.shape[1]).astype(embed.dtype))
    return d_embed, None, None


_pallas_mean.defvjp(_pallas_mean_fwd, _pallas_mean_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_max(embed, idx, mask, interpret, _tag):
    return _pallas_aggregate_fwd(embed, idx, mask, "max", interpret)


def _pallas_max_fwd(embed, idx, mask, interpret, _tag):
    out = _pallas_aggregate_fwd(embed, idx, mask, "max", interpret)
    return out, (embed, idx, mask, out)


def _pallas_max_bwd(interpret, _tag, res, g):
    embed, idx, mask, out = res
    # route grad to slots achieving the max (ties share equally, matching
    # subgradient convention closely enough for SGD)
    gathered = jnp.take(embed, idx, axis=0)               # [U, S, D]
    is_max = ((gathered == out[:, None, :])
              & (mask[:, :, None] > 0)).astype(g.dtype)
    denom = jnp.maximum(jnp.sum(is_max, axis=1, keepdims=True), 1.0)
    contrib = g[:, None, :] * is_max / denom
    d_embed = jnp.zeros_like(embed).at[idx.reshape(-1)].add(
        contrib.reshape(-1, embed.shape[1]).astype(embed.dtype))
    return d_embed, None, None


_pallas_max.defvjp(_pallas_max_fwd, _pallas_max_bwd)


def _must_fall_back(embed, interpret: bool) -> bool:
    """The kernels read single rows at dynamic offsets
    (``embed_ref[pl.ds(i, 1), :]``); Mosaic can prove the alignment it
    needs for 32-bit tiles (8, 128) but not for 16-bit (16, 128) — a
    bf16 embed fails TPU compilation with "cannot statically prove that
    index in dimension 0 is a multiple of 8".  Route sub-32-bit dtypes
    to the XLA op on real TPU (interpret mode has no such constraint)."""
    if not _fits_vmem(embed):
        return True
    return not interpret and jnp.dtype(embed.dtype).itemsize < 4


def pallas_mean_aggregate(embed, idx, mask, interpret: bool | None = None):
    """Fused masked-mean aggregation.  Falls back to the XLA op when the
    embedding block exceeds the VMEM budget or the dtype cannot be row-
    sliced dynamically on TPU (see :func:`_must_fall_back`)."""
    if interpret is None:
        interpret = not _on_tpu()
    if _must_fall_back(embed, interpret):
        return xla_agg.mean_aggregate(embed, idx, mask)
    return _pallas_mean(embed, idx, mask.astype(embed.dtype), interpret,
                        "mean")


def pallas_max_aggregate(embed, idx, mask, interpret: bool | None = None):
    """Fused masked-max aggregation (VMEM-resident embed path; same
    fallback rules as :func:`pallas_mean_aggregate`)."""
    if interpret is None:
        interpret = not _on_tpu()
    if _must_fall_back(embed, interpret):
        return xla_agg.max_aggregate(embed, idx, mask)
    return _pallas_max(embed, idx, mask.astype(embed.dtype), interpret,
                       "max")
