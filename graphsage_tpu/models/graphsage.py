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

from graphsage_tpu.models.layers import init_sage_layer, sage_layer_apply
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
        agg = _aggregate(cfg, params, layer, h, frontier)
        self_feats = jnp.take(h, frontier.self_idx, axis=0)
        h = sage_layer_apply(params["layers"][layer], self_feats, agg,
                             gcn=cfg.gcn)
    return h
