"""Data layer: CSR construction, padded compile, loaders, splits.

Invariants mirrored from the reference's runtime asserts
(src/dataCenter.py:37,43,88) and documented dataset stats (cora/README)."""

import numpy as np
import pytest

from graphsage_tpu.data import (
    CSRGraph,
    load_cora,
    load_pubmed,
    split_nodes,
    synthetic_power_law,
)


def test_csr_from_edges_undirected_dedup():
    # duplicate edge (0,1) + both directions given explicitly must dedup
    src = np.array([0, 1, 0, 2])
    dst = np.array([1, 0, 1, 0])
    g = CSRGraph.from_edges(3, src, dst)
    assert g.num_edges == 4  # (0,1),(1,0),(0,2),(2,0)
    assert list(g.neighbors(0)) == [1, 2]
    assert list(g.neighbors(1)) == [0]
    assert list(g.neighbors(2)) == [0]


def test_csr_keeps_self_loops():
    g = CSRGraph.from_edges(2, np.array([0]), np.array([0]))
    assert list(g.neighbors(0)) == [0]


def test_padded_adjacency_roundtrip():
    src = np.array([0, 0, 0, 1])
    dst = np.array([1, 2, 3, 2])
    g = CSRGraph.from_edges(4, src, dst)
    pad = g.to_padded()
    assert pad.width == 3  # node 0 has degree 3
    np.testing.assert_array_equal(pad.degrees, g.degrees)
    for v in range(4):
        np.testing.assert_array_equal(
            np.sort(pad.neighbors[v, :pad.degrees[v]]), g.neighbors(v))
    assert not pad.truncated


def test_padded_adjacency_cap():
    g = CSRGraph.from_edges(4, np.array([0, 0, 0]), np.array([1, 2, 3]))
    pad = g.to_padded(cap=2)
    assert pad.width == 2
    assert pad.degrees[0] == 2
    assert pad.true_degrees[0] == 3
    assert pad.truncated


def test_split_reference_semantics():
    # reference src/dataCenter.py:100-111: test=N//3, val=N//6, train=rest,
    # taken from one seeded permutation
    test, val, train = split_nodes(2708, seed=824)
    assert len(test) == 2708 // 3
    assert len(val) == 2708 // 6
    assert len(train) == 2708 - len(test) - len(val)
    allv = np.concatenate([test, val, train])
    assert len(np.unique(allv)) == 2708
    # deterministic
    test2, _, _ = split_nodes(2708, seed=824)
    np.testing.assert_array_equal(test, test2)


def test_load_cora_real_graph():
    ds = load_cora()
    # cora/README: 2708 nodes; cites file has 5429 edges → ≤ 2*5429 directed
    assert ds.num_nodes == 2708
    assert ds.feature_dim == 1433
    assert ds.num_classes == 7
    assert 2 * 5000 < ds.graph.num_edges <= 2 * 5429
    assert ds.labels.min() >= 0 and ds.labels.max() < 7
    deg = ds.graph.degrees
    assert deg.min() >= 1  # every node appears in the cites file


def test_load_pubmed_real_graph():
    ds = load_pubmed()
    assert ds.num_classes == 3
    assert ds.feature_dim == 500
    assert ds.graph.num_edges > 80000  # 44338 undirected-ized, minus dups
    assert ds.num_nodes > 19000


def test_synthetic_power_law():
    ds = synthetic_power_law(1000, 5000, num_feats=32, num_classes=4, seed=1)
    assert ds.num_nodes == 1000
    deg = ds.graph.degrees
    # power-law: max degree far above median
    assert deg.max() > 10 * max(1, np.median(deg))
    # deterministic
    ds2 = synthetic_power_law(1000, 5000, num_feats=32, num_classes=4, seed=1)
    np.testing.assert_array_equal(ds.graph.indices, ds2.graph.indices)


def test_to_padded_sampled_uniform_and_takeall():
    from graphsage_tpu.data import CSRGraph

    rng = np.random.RandomState(0)
    # star graph: node 0 connects to 1..60 (degree 60), others degree 1-2
    n = 61
    src = np.zeros(60, np.int64)
    dst = np.arange(1, 61, dtype=np.int64)
    g = CSRGraph.from_edges(n, src, dst)
    cap = 8
    pad = g.to_padded_sampled(cap, rng)
    assert pad.width == cap
    assert pad.truncated
    # hub row: exactly cap entries, all real neighbors, no duplicates
    hub = pad.neighbors[0][:pad.degrees[0]]
    assert pad.degrees[0] == cap
    assert len(set(hub.tolist())) == cap
    assert set(hub.tolist()) <= set(range(1, 61))
    # degree-1 rows: take-all, exact neighbor
    for v in range(1, 61):
        assert pad.degrees[v] == 1
        assert pad.neighbors[v, 0] == 0
    # uniformity: over many draws every hub neighbor appears ~cap/60 of the
    # time (chi-square-ish bound)
    counts = np.zeros(n)
    trials = 400
    for t in range(trials):
        p = g.to_padded_sampled(cap, np.random.RandomState(1000 + t))
        counts[p.neighbors[0][:cap]] += 1
    freq = counts[1:61] / trials
    expected = cap / 60.0
    assert np.all(np.abs(freq - expected) < 6 * np.sqrt(
        expected * (1 - expected) / trials))


def test_to_padded_sampled_matches_topology():
    """Sampled table rows are always subsets of the true adjacency."""
    from graphsage_tpu.data import CSRGraph

    rng = np.random.RandomState(3)
    src = rng.randint(0, 50, 300)
    dst = rng.randint(0, 50, 300)
    keep = src != dst
    g = CSRGraph.from_edges(50, src[keep], dst[keep])
    pad = g.to_padded_sampled(4, rng)
    for v in range(50):
        row = set(pad.neighbors[v][:pad.degrees[v]].tolist())
        assert row <= set(g.neighbors(v).tolist())
        assert pad.degrees[v] == min(len(g.neighbors(v)), 4)


def test_load_dataset_powerlaw_ignores_data_root():
    """The CLI/serving entrypoints forward root= whenever --data_root is
    set; the synthetic generator reads no files and must not raise on it
    (it used to TypeError on the unexpected keyword)."""
    from graphsage_tpu.data.loaders import load_dataset

    ds = load_dataset("powerlaw:300:1200", seed=1, root="/nonexistent")
    assert ds.num_nodes == 300
