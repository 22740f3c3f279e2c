"""The GraphSAGE encoder over compiled fixed-shape frontier tables.

Reference control flow (src/models.py:241-269): top-down Python-set sampling
builds per-layer union lists, then a bottom-up loop aggregates + applies
SageLayers.  Here the sampled computation graph is a list of `Frontier`
tensors — static-shape index tables — and the whole bottom-up encode is pure
jnp, traced once under `jit`.  Samplers (host or device) produce the
frontiers; the encoder never touches Python data structures.

Frontier layout for layer l (bottom-up order, l = 1..L):
  idx      [U_l, S] int32 — slots index rows of the *previous* layer's
           embedding matrix (layer-0 matrix = gathered raw features).
           S = fanout (+1 when a self slot is included for gcn mode).
  mask     [U_l, S] float — 1 for slots that participate in aggregation.
           Encodes the reference's set dance: sample ∪ {self} then remove
           self unless gcn (src/models.py:285, 297-298), degree<fanout
           take-all rule (src/models.py:282), and row padding.
  self_idx [U_l] int32 — row of the previous matrix holding the node's own
           features (the reference's `_nodes_map`, src/models.py:271-275).

Rows beyond the real union size are padding: idx/self_idx 0, mask 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from graphsage_tpu.models.layers import (
    init_sage_layer,
    mean_pretransform,
    sage_layer_apply,
)
from graphsage_tpu.models.lstm_agg import init_lstm_agg, lstm_aggregate
from graphsage_tpu.ops.aggregate import max_aggregate, mean_aggregate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frontier:
    idx: Any        # [U, S] int32
    mask: Any       # [U, S] float
    self_idx: Any   # [U] int32


@dataclasses.dataclass(frozen=True)
class GraphSageConfig:
    num_layers: int = 2          # reference src/experiments.conf:11
    input_size: int = 1433
    out_size: int = 128          # reference src/experiments.conf:12
    gcn: bool = False
    agg_func: str = "MEAN"       # MEAN | MAX | LSTM
    impl: str = "xla"            # xla | pallas (fused gather-reduce kernels)
    # Mixed precision: params are kept in float32 (master weights); the
    # forward/backward compute runs in this dtype.  "bfloat16" is the
    # MXU-native mode — matmuls take bf16 inputs and accumulate f32 via
    # preferred_element_type; loss reductions stay f32.  No reference
    # counterpart (torch f32 end-to-end); F1 parity is tested in
    # tests/test_bf16.py.
    compute_dtype: str = "float32"    # float32 | bfloat16
    # MEAN-layer restructuring: mean is linear, so W·mean(neigh) =
    # mean(W·neigh) — transform the embedding matrix by the layer weight
    # FIRST ([M, D]·[D, H]) and gather/average in H-space.  Cuts gather
    # traffic by D/H (≈11x at 1433→128) and FLOPs whenever embedding rows
    # are shared between output rows.  "auto" applies it when the static
    # shapes favor it; exact to matmul-reassociation rounding.
    mean_pretransform: str = "auto"   # auto | never | always

    def layer_input_size(self, layer: int) -> int:
        """Layer 1 consumes raw features, deeper layers consume out_size
        (reference src/models.py:237-239)."""
        return self.input_size if layer == 0 else self.out_size


def init_graphsage(key: jax.Array, cfg: GraphSageConfig,
                   dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 2 * cfg.num_layers)
    params: dict = {"layers": [], "agg": []}
    for i in range(cfg.num_layers):
        in_size = cfg.layer_input_size(i)
        params["layers"].append(
            init_sage_layer(keys[2 * i], in_size, cfg.out_size,
                            gcn=cfg.gcn, dtype=dtype))
        if cfg.agg_func == "LSTM":
            params["agg"].append(init_lstm_agg(keys[2 * i + 1], in_size,
                                               dtype=dtype))
    if not params["agg"]:
        del params["agg"]
    return params


def _aggregate(cfg: GraphSageConfig, params: dict, layer: int,
               embed: jax.Array, frontier: Frontier) -> jax.Array:
    if cfg.impl == "pallas" and cfg.agg_func in ("MEAN", "MAX"):
        from graphsage_tpu.ops.pallas_aggregate import (
            pallas_max_aggregate,
            pallas_mean_aggregate,
        )
        fn = (pallas_mean_aggregate if cfg.agg_func == "MEAN"
              else pallas_max_aggregate)
        return fn(embed, frontier.idx, frontier.mask)
    if cfg.agg_func == "MEAN":
        return mean_aggregate(embed, frontier.idx, frontier.mask)
    if cfg.agg_func == "MAX":
        return max_aggregate(embed, frontier.idx, frontier.mask)
    if cfg.agg_func == "LSTM":
        return lstm_aggregate(params["agg"][layer], embed,
                              frontier.idx, frontier.mask)
    raise ValueError(f"unknown agg_func {cfg.agg_func!r}")


def graphsage_apply(params: dict, cfg: GraphSageConfig, x0: jax.Array,
                    frontiers: Sequence[Frontier]) -> jax.Array:
    """Bottom-up encode (reference src/models.py:255-269).

    x0: [U_0, D] raw-feature rows for the deepest union.
    frontiers: length-num_layers list, frontiers[l] maps layer-l rows onto
    layer-(l-1) rows.  Returns [U_L, out_size] embeddings, row order = the
    top frontier's union order (= the batch for a full pipeline).
    """
    assert len(frontiers) == cfg.num_layers
    h = x0
    for layer, frontier in enumerate(frontiers):
        with jax.named_scope(f"sage_layer_{layer + 1}"):
            if _use_pretransform(cfg, h, frontier):
                h = _mean_pretransform_layer(cfg, params["layers"][layer],
                                             h, frontier)
                continue
            agg = _aggregate(cfg, params, layer, h, frontier)
            self_feats = jnp.take(h, frontier.self_idx, axis=0)
            h = sage_layer_apply(params["layers"][layer], self_feats, agg,
                                 gcn=cfg.gcn)
    return h


def graphsage_apply_gathered(params: dict, cfg: GraphSageConfig,
                             feats: jax.Array, x0_ids: jax.Array,
                             frontiers: Sequence[Frontier]) -> jax.Array:
    """Like graphsage_apply but takes the full feature table + gather ids.

    Enables the strongest form of the MEAN pretransform: when the table has
    fewer rows than the expanded frontier (N ≤ U0 — always true for dense
    per-occurrence expansion on small/medium graphs), layer 1 transforms the
    TABLE once ([N, D]·[D, H]) and every gather moves H-wide rows instead of
    D-wide ones.
    """
    f0 = frontiers[0]
    u0 = x0_ids.shape[0]
    n = feats.shape[0]
    apply_table = (
        cfg.agg_func == "MEAN" and cfg.mean_pretransform != "never"
        and cfg.impl != "pallas"  # same rule as _use_pretransform: an
        # explicit pallas request must actually run the pallas aggregate
        and (cfg.mean_pretransform == "always" or n <= 2 * u0))
    if not apply_table:
        with jax.named_scope("x0_gather"):
            x0 = jnp.take(feats, x0_ids, axis=0)
        return graphsage_apply(params, cfg, x0, frontiers)

    w = params["layers"][0]["weight"]
    # compose index maps: frontier slots → x0 rows → table rows
    idx_t = jnp.take(x0_ids, f0.idx, axis=0)
    self_t = jnp.take(x0_ids, f0.self_idx, axis=0)
    if cfg.gcn:
        h_agg = mean_pretransform(w, feats, gcn=True)
        h = jax.nn.relu(mean_aggregate(h_agg, idx_t, f0.mask))
    else:
        # one fused [N, D]·[D, 2H] pass (reads the feature table once)
        h_cat = mean_pretransform(w, feats)                      # [N, 2H]
        hdim = w.shape[0]
        agg = mean_aggregate(h_cat[:, hdim:], idx_t, f0.mask)
        h = jax.nn.relu(agg + jnp.take(h_cat[:, :hdim], self_t, axis=0))

    for layer in range(1, cfg.num_layers):
        frontier = frontiers[layer]
        if _use_pretransform(cfg, h, frontier):
            h = _mean_pretransform_layer(cfg, params["layers"][layer], h,
                                         frontier)
            continue
        agg = _aggregate(cfg, params, layer, h, frontier)
        self_feats = jnp.take(h, frontier.self_idx, axis=0)
        h = sage_layer_apply(params["layers"][layer], self_feats, agg,
                             gcn=cfg.gcn)
    return h


def _use_pretransform(cfg: GraphSageConfig, h: jax.Array,
                      frontier: Frontier) -> bool:
    if cfg.agg_func != "MEAN" or cfg.mean_pretransform == "never":
        return False
    # an explicit impl="pallas" asks for the fused Pallas aggregate —
    # the pretransform restructures layers to avoid aggregates entirely,
    # which would silently bypass the kernels the user requested (e.g. a
    # pallas-vs-xla validation run measuring the wrong path)
    if cfg.impl == "pallas":
        return False
    if cfg.mean_pretransform == "always":
        return True
    m = h.shape[0]
    u = frontier.idx.shape[0]
    # FLOP-equal at m == u (non-gcn); the traffic win scales with D/H, so
    # allow extra transform FLOPs when the feature dim is wide.
    d = h.shape[1]
    width_bonus = 2 if d >= 4 * cfg.out_size else 1
    return m <= 2 * u * width_bonus


def _mean_pretransform_layer(cfg: GraphSageConfig, layer_params: dict,
                             h: jax.Array, frontier: Frontier) -> jax.Array:
    """relu(W·[self ‖ mean(neigh)]) computed as
    relu(mean((W_agg·h)[neigh]) + (W_self·h)[self]) — exact by linearity of
    the mean (reference semantics src/models.py:209-220 + :311-314)."""
    w = layer_params["weight"]                     # [H, 2D] (or [H, D] gcn)
    if cfg.gcn:
        h_agg = mean_pretransform(w, h, gcn=True)  # [M, H]
        agg = mean_aggregate(h_agg, frontier.idx, frontier.mask)
        return jax.nn.relu(agg)
    h_cat = mean_pretransform(w, h)                # [M, 2H], one fused pass
    hdim = w.shape[0]
    agg = mean_aggregate(h_cat[:, hdim:], frontier.idx, frontier.mask)
    out = agg + jnp.take(h_cat[:, :hdim], frontier.self_idx, axis=0)
    return jax.nn.relu(out)
