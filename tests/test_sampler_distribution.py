"""Statistical checks: samplers must be uniform without replacement
(reference semantics src/models.py:280-284) — frequency tests over many
draws for both the device sampler and the native C++ sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.data import CSRGraph


def star_graph(center_deg=20):
    """node 0 connected to 1..center_deg."""
    src = np.zeros(center_deg, dtype=np.int64)
    dst = np.arange(1, center_deg + 1)
    return CSRGraph.from_edges(center_deg + 1, src, dst)


def test_device_sampler_uniform():
    from graphsage_tpu.sampler.device import _sample_one_hop
    deg, fanout, trials = 20, 10, 400
    g = star_graph(deg)
    pad = g.to_padded()
    neighbors = jnp.asarray(pad.neighbors)
    degrees = jnp.asarray(pad.degrees)
    nodes = jnp.zeros(trials, dtype=jnp.int32)  # node 0, many draws

    samples, valid = jax.jit(
        lambda k: _sample_one_hop(k, neighbors, degrees, nodes, fanout)
    )(jax.random.PRNGKey(0))
    samples, valid = np.asarray(samples), np.asarray(valid)

    assert valid.all()  # deg >= fanout → all slots valid
    # without replacement within each draw
    for r in range(trials):
        assert len(set(samples[r])) == fanout
    # uniform marginal: each neighbor ∈ 1..20 appears with p = 10/20
    counts = np.bincount(samples.reshape(-1), minlength=deg + 1)[1:]
    expected = trials * fanout / deg
    # 4-sigma binomial bound
    sigma = np.sqrt(trials * (fanout / deg) * (1 - fanout / deg))
    assert np.all(np.abs(counts - expected) < 4 * sigma + 1), counts


def test_native_sampler_uniform():
    pytest.importorskip("graphsage_tpu.native")
    from graphsage_tpu.native import available, sample_fanout_native
    if not available():
        pytest.skip("native engine not built")
    deg, fanout, trials = 20, 10, 400
    g = star_graph(deg)
    nodes = np.zeros(trials, dtype=np.int32)
    out, counts_per = sample_fanout_native(g.indptr, g.indices, g.num_nodes,
                                           nodes, fanout, seed=7)
    assert (counts_per == fanout).all()
    for r in range(trials):
        assert len(set(out[r].tolist())) == fanout
    counts = np.bincount(out.reshape(-1), minlength=deg + 1)[1:]
    expected = trials * fanout / deg
    sigma = np.sqrt(trials * 0.5 * 0.5)
    assert np.all(np.abs(counts - expected) < 4 * sigma + 1), counts


def test_walk_positives_uniform_over_neighbors():
    """WALK_LEN=1 walks: each neighbor of a train node should be hit
    roughly uniformly (reference src/models.py:169-186)."""
    from graphsage_tpu.sampler import PairSampler
    deg = 8
    g = star_graph(deg)
    train = np.arange(g.num_nodes)
    ps = PairSampler(g, train)
    rng = np.random.RandomState(0)
    counts = np.zeros(deg + 1)
    trials = 300
    for _ in range(trials):
        for p in ps.positives(0, rng):
            counts[p] += 1
    total = counts.sum()
    assert total > 0
    expected = total / deg
    assert np.all(np.abs(counts[1:] - expected) < 5 * np.sqrt(expected)), \
        counts


def test_subsampled_table_is_exactly_uniform():
    """Sampling K of a random cap-subset == uniform K-of-degree (subset
    composition).  Frequency check with per-draw resubsampling."""
    from graphsage_tpu.sampler.device import _sample_one_hop
    deg, cap, fanout, trials = 20, 12, 10, 300
    g = star_graph(deg)
    pad = g.to_padded()
    rng = np.random.RandomState(0)
    counts = np.zeros(deg + 1)
    key = jax.random.PRNGKey(0)
    nodes = jnp.zeros(4, dtype=jnp.int32)
    fn = jax.jit(lambda k, nb, dg: _sample_one_hop(k, nb, dg, nodes,
                                                   fanout))
    for t in range(trials // 4):
        sub = pad.subsample(cap, rng)
        key, sk = jax.random.split(key)
        samples, valid = fn(sk, jnp.asarray(sub.neighbors),
                            jnp.asarray(sub.degrees))
        s = np.asarray(samples)[np.asarray(valid)]
        for x in s:
            counts[x] += 1
        # no replacement within each row
        for r in range(4):
            row = np.asarray(samples)[r][np.asarray(valid)[r]]
            assert len(set(row.tolist())) == len(row)
    total = counts.sum()
    expected = total / deg
    assert np.all(np.abs(counts[1:] - expected) < 5 * np.sqrt(expected)), \
        counts


def test_take_all_branch_is_random_permutation():
    """When the padded table is narrower than the fanout, the sampler
    returns the whole row — but its ORDER must still be a fresh random
    permutation per key: the LSTM aggregator's slot order is the paper's
    random permutation, and a fixed CSR-order prefix would silently make
    the LSTM sequence deterministic."""
    from graphsage_tpu.sampler.device import _sample_one_hop

    # one node of degree 6 in a table of width 6 < fanout 10
    neighbors = jnp.asarray(np.array([[1, 2, 3, 4, 5, 6]], np.int32))
    degrees = jnp.asarray(np.array([6], np.int32))
    nodes = jnp.asarray(np.array([0], np.int32))

    orders = set()
    counts = np.zeros((6, 6), np.int64)  # counts[slot, neighbor-1]
    trials = 600
    for t in range(trials):
        s, v = _sample_one_hop(jax.random.PRNGKey(t), neighbors, degrees,
                               nodes, fanout=10)
        s = np.asarray(s)[0]
        assert np.asarray(v)[0, :6].all() and not np.asarray(v)[0, 6:].any()
        assert sorted(s[:6].tolist()) == [1, 2, 3, 4, 5, 6]  # take-all set
        orders.add(tuple(s[:6].tolist()))
        for slot in range(6):
            counts[slot, s[slot] - 1] += 1
    assert len(orders) > 50  # far from a single fixed order
    # every neighbor appears in every slot with ~uniform frequency
    expected = trials / 6
    assert (np.abs(counts - expected) < 6 * np.sqrt(expected)).all(), counts
