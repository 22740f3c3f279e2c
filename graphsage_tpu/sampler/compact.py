"""Compact (deduplicated) batch builder — the parity/memory-efficient path.

Replicates the reference's sampled-computation-graph construction
(src/models.py:246-253 top-down sampling, :277-289 per-unique-node fanout
sampling with the self-union, :291-308 aggregation index building,
:271-275 self-row mapping) but emits **fixed-shape padded index tensors**
(`Frontier`s) instead of Python sets, so the device step is a single traced
`jit`.  Union sizes are padded to buckets to bound recompilation.

Shared-sample semantics: like the reference, each *unique* node in a layer
is sampled once and all consumers see the same sample set.  (The dense
device sampler in sampler/device.py trades this for per-occurrence
independence to stay allocation-free on device.)

This builder is also the parity instrument: `sample_sets` can be injected,
allowing recorded reference subgraphs to be replayed for allclose checks
(SURVEY §3 RNG notes — parity via recorded subgraphs, not RNG emulation).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from graphsage_tpu.data.graph import CSRGraph
from graphsage_tpu.models.graphsage import Frontier


def _bucket(n: int, minimum: int = 32) -> int:
    """Round up to the next power of two (≥ minimum) so only O(log U)
    distinct shapes ever reach the compiler."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _build_compact_batch_native(graph: CSRGraph, batch_nodes: np.ndarray,
                                rng: np.random.RandomState, num_layers: int,
                                fanout: int, gcn: bool):
    """C++ fast path: build at worst-case caps, then slice down to bucket
    sizes.  Returns None when the native engine is unavailable."""
    try:
        from graphsage_tpu.native import build_compact_batch_native
    except Exception:
        return None

    b = len(batch_nodes)
    u_caps = np.zeros(num_layers + 1, dtype=np.int32)
    cap = b
    for d in range(num_layers + 1):
        # bucketed caps guarantee bucket(actual_size) <= cap, so the
        # post-build slice-down is always within the filled buffers
        u_caps[d] = _bucket(min(graph.num_nodes + b, cap))
        cap *= fanout + 1
    seed = int(rng.randint(0, 2**63 - 1))
    out = build_compact_batch_native(
        graph.indptr, graph.indices, graph.num_nodes,
        batch_nodes.astype(np.int32), num_layers, fanout, gcn, seed, u_caps)
    if out is None:
        return None
    union_sizes, x0_ids_full, layers = out

    frontiers = []
    for j, (idx, mask, self_idx) in enumerate(layers):
        level = num_layers - 1 - j
        u = _bucket(int(union_sizes[level]))
        frontiers.append(Frontier(idx=np.ascontiguousarray(idx[:u]),
                                  mask=np.ascontiguousarray(mask[:u]),
                                  self_idx=np.ascontiguousarray(
                                      self_idx[:u])))
    u0 = _bucket(int(union_sizes[num_layers]))
    x0_ids = np.ascontiguousarray(x0_ids_full[:u0])
    return CompactBatch(
        x0_ids=x0_ids, frontiers=tuple(frontiers),
        batch_nodes=batch_nodes.astype(np.int32), batch_size=b,
        out_rows=frontiers[-1].idx.shape[0])


@dataclasses.dataclass(frozen=True)
class CompactBatch:
    """Device-ready sampled computation graph for one batch."""
    x0_ids: np.ndarray             # int32 [U0_pad] rows of the feature table
    frontiers: tuple               # bottom-up Frontier tuple (numpy arrays)
    batch_nodes: np.ndarray        # int32 [B] the real (unpadded) batch
    batch_size: int                # = len(batch_nodes)
    out_rows: int                  # padded row count of the output


def sample_neighbor_sets(graph: CSRGraph, nodes: Sequence[int],
                         rng: np.random.RandomState, fanout: int = 10,
                         ) -> list[set]:
    """Uniform fanout sampling without replacement, take-all below fanout,
    then union the self node in — reference src/models.py:280-285."""
    out = []
    for v in nodes:
        neigh = graph.neighbors(int(v))
        if len(neigh) >= fanout:
            samp = set(rng.choice(neigh, size=fanout, replace=False).tolist())
        else:
            samp = set(int(x) for x in neigh)
        samp.add(int(v))
        out.append(samp)
    return out


def shuffle_frontier_slots(frontiers, rng: np.random.RandomState):
    """Jointly permute each row's neighbor slots (idx+mask) — gives the
    LSTM aggregator the random neighbor order the GraphSAGE paper
    prescribes (order-invariant aggregators are unaffected; masked pads
    are skipped wherever they land)."""
    out = []
    for f in frontiers:
        u, s_ = f.idx.shape
        order = np.argsort(rng.rand(u, s_), axis=1)
        out.append(Frontier(
            idx=np.take_along_axis(f.idx, order, axis=1),
            mask=np.take_along_axis(f.mask, order, axis=1),
            self_idx=f.self_idx))
    return tuple(out)


def build_compact_batch(graph: CSRGraph, batch_nodes: np.ndarray,
                        rng: np.random.RandomState, num_layers: int = 2,
                        fanout: int = 10, gcn: bool = False,
                        sample_sets: list[list[set]] | None = None,
                        bucket: bool = True, shuffle_slots: bool = False,
                        native: str = "auto") -> CompactBatch:
    """Build per-layer padded frontiers for a batch.

    sample_sets, when given, is a list (top-down: entry 0 belongs to the
    batch layer) of per-node sample sets *including self*, used verbatim
    instead of fresh sampling — the parity-replay hook.

    native: "auto" uses the C++ engine (csrc/gs_native.cpp) when built —
    ~100x faster frontier construction, its own deterministic RNG stream
    seeded from ``rng``; "never" forces the numpy path (used by parity
    replay and as fallback).
    """
    batch_nodes = np.asarray(batch_nodes, dtype=np.int64)

    if native == "auto" and sample_sets is None and bucket:
        cb = _build_compact_batch_native(graph, batch_nodes, rng,
                                         num_layers, fanout, gcn)
        if cb is not None:
            if shuffle_slots:
                cb = dataclasses.replace(
                    cb, frontiers=shuffle_frontier_slots(cb.frontiers, rng))
            return cb

    # --- top-down sampling: build union lists (reference src/models.py:246-253)
    levels: list[dict] = [{"nodes": batch_nodes.tolist(), "samp": None}]
    lower = batch_nodes.tolist()
    for depth in range(num_layers):
        if sample_sets is not None:
            samp = sample_sets[depth]
            assert len(samp) == len(lower)
        else:
            samp = sample_neighbor_sets(graph, lower, rng, fanout)
        union: list[int] = []
        seen: set[int] = set()
        for s in samp:
            for n in sorted(s):
                if n not in seen:
                    seen.add(n)
                    union.append(n)
        levels[-1]["samp"] = samp  # samples belong to the level above
        levels.append({"nodes": union, "samp": None})
        lower = union
    # levels[0] = batch (top) ... levels[num_layers] = deepest union

    # --- bottom-up frontier tensors
    slot_width = fanout + 1  # sample set may hold fanout neighbors + self
    frontiers: list[Frontier] = []
    for li in range(num_layers, 0, -1):  # li indexes the *previous* level
        prev_nodes = levels[li]["nodes"]
        cur_nodes = levels[li - 1]["nodes"]
        samp = levels[li - 1]["samp"]
        prev_pos = {n: i for i, n in enumerate(prev_nodes)}

        u_pad = _bucket(len(cur_nodes)) if bucket else len(cur_nodes)
        idx = np.zeros((u_pad, slot_width), dtype=np.int32)
        mask = np.zeros((u_pad, slot_width), dtype=np.float32)
        self_idx = np.zeros(u_pad, dtype=np.int32)
        for r, v in enumerate(cur_nodes):
            self_idx[r] = prev_pos[v]
            # aggregation set: sample ∪ {self} minus self unless gcn
            # (reference src/models.py:285, 297-298)
            members = samp[r] if gcn else (samp[r] - {v})
            for c, n in enumerate(sorted(members)):
                idx[r, c] = prev_pos[n]
                mask[r, c] = 1.0
        frontiers.append(Frontier(idx=idx, mask=mask, self_idx=self_idx))

    deepest = levels[num_layers]["nodes"]
    u0_pad = _bucket(len(deepest)) if bucket else len(deepest)
    x0_ids = np.zeros(u0_pad, dtype=np.int32)
    x0_ids[:len(deepest)] = deepest

    fr = tuple(frontiers)
    if shuffle_slots:
        fr = shuffle_frontier_slots(fr, rng)
    return CompactBatch(
        x0_ids=x0_ids,
        frontiers=fr,
        batch_nodes=batch_nodes.astype(np.int32),
        batch_size=len(batch_nodes),
        out_rows=fr[-1].idx.shape[0],
    )
