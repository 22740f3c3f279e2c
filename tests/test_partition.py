"""BFS reordering partitioner: permutation validity, dataset relabeling
consistency, and locality improvement on community-structured graphs."""

import numpy as np
import pytest

from graphsage_tpu.data import CSRGraph, synthetic_power_law
from graphsage_tpu.parallel.partition import (
    bfs_reorder,
    partition_locality,
    relabel_dataset,
    relabel_graph,
)


def community_graph(rng, n_comm=8, size=50, p_in=0.2, p_out=0.002):
    n = n_comm * size
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if i // size == j // size else p_out
            if rng.rand() < p:
                src.append(i)
                dst.append(j)
    # scatter ids so natural order has no locality
    perm = rng.permutation(n)
    return CSRGraph.from_edges(n, perm[np.array(src)], perm[np.array(dst)])


def test_bfs_reorder_is_permutation():
    rng = np.random.RandomState(0)
    g = community_graph(rng, n_comm=4, size=20)
    perm = bfs_reorder(g)
    assert sorted(perm.tolist()) == list(range(g.num_nodes))


def test_reorder_improves_locality():
    rng = np.random.RandomState(1)
    g = community_graph(rng)
    before = partition_locality(g, 8)
    g2 = relabel_graph(g, bfs_reorder(g))
    after = partition_locality(g2, 8)
    assert after > before + 0.2, (before, after)


def test_relabel_graph_preserves_structure():
    rng = np.random.RandomState(2)
    g = community_graph(rng, n_comm=3, size=15)
    perm = bfs_reorder(g)
    g2 = relabel_graph(g, perm)
    assert g2.num_edges == g.num_edges
    for v in range(0, g.num_nodes, 7):
        want = sorted(perm[g.neighbors(v)].tolist())
        got = sorted(g2.neighbors(int(perm[v])).tolist())
        assert got == want


def test_relabel_dataset_consistency():
    ds = synthetic_power_law(200, 900, num_feats=8, num_classes=3, seed=5)
    perm = bfs_reorder(ds.graph)
    ds2 = relabel_dataset(ds, perm)
    # node v in old labeling = node perm[v] in new: features/labels follow
    for v in [0, 13, 77, 199]:
        nv = int(perm[v])
        np.testing.assert_array_equal(ds2.features[nv], ds.features[v])
        assert ds2.labels[nv] == ds.labels[v]
    assert set(ds2.train_nodes.tolist()) == set(
        perm[ds.train_nodes].tolist())
