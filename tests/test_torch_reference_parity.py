"""Parity against the ACTUAL reference implementation (torch CPU).

Loads the reference's models.py from the read-only mount, records the
neighbor samples its forward draws, replays the identical sampled subgraph
through our compact builder + jit encoder with the reference's own weights,
and asserts allclose — the BASELINE.json parity bar, end to end, with zero
reimplementation on the oracle side.

Skipped when torch or the reference mount is unavailable.
"""

import importlib.util
import os
import sys
from collections import defaultdict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODELS = "/root/reference/src/models.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_MODELS),
                                reason="reference mount absent")


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_models", REF_MODELS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Python >= 3.11 removed random.sample(set) which the reference uses
    # (src/models.py:282); shim it inside the loaded module only.
    import random as _random
    orig = _random.sample

    def sample_any(pop, k):
        if isinstance(pop, (set, frozenset)):
            pop = sorted(pop)
        return orig(pop, k)

    mod.random.sample = sample_any
    return mod


def small_graph(rng, n=40, extra=100):
    from graphsage_tpu.data import CSRGraph
    src = np.arange(n)
    dst = (src + 1) % n
    es = rng.randint(0, n, extra)
    ed = rng.randint(0, n, extra)
    keep = es != ed
    g = CSRGraph.from_edges(n, np.concatenate([src, es[keep]]),
                            np.concatenate([dst, ed[keep]]))
    adj = defaultdict(set)
    for v in range(n):
        adj[v] = set(int(x) for x in g.neighbors(v))
    return g, adj


@pytest.mark.parametrize("agg", ["MEAN", "MAX"])
@pytest.mark.parametrize("gcn", [False, True])
def test_forward_parity_with_reference(ref, agg, gcn):
    import jax.numpy as jnp
    import jax

    from graphsage_tpu.models import GraphSageConfig, graphsage_apply
    from graphsage_tpu.sampler import build_compact_batch

    rng = np.random.RandomState(11)
    n, d, h, fanout, layers = 40, 9, 7, 4, 2
    graph, adj = small_graph(rng)
    feats = rng.randn(n, d).astype(np.float32)

    device = torch.device("cpu")
    torch.manual_seed(3)
    gs = ref.GraphSage(layers, d, h, torch.FloatTensor(feats), adj, device,
                       gcn=gcn, agg_func=agg)

    # record the samples the reference draws, keyed by node per depth
    recorded: list[dict] = []
    orig_fn = gs._get_unique_neighs_list

    def recording(nodes, num_sample=10):
        out = orig_fn(nodes, fanout)
        samp_neighs = out[0]
        recorded.append({int(v): set(int(x) for x in s)
                         for v, s in zip(nodes, samp_neighs)})
        return out

    gs._get_unique_neighs_list = recording

    batch = rng.choice(n, 8, replace=False).tolist()
    with torch.no_grad():
        out_ref = gs(batch).numpy()

    assert len(recorded) == layers

    # rebuild topdown sample-set lists aligned with OUR union ordering
    sample_sets = []
    lower = list(batch)
    for depth in range(layers):
        sets = [recorded[depth][v] for v in lower]
        sample_sets.append(sets)
        union, seen = [], set()
        for s in sets:
            for x in sorted(s):
                if x not in seen:
                    seen.add(x)
                    union.append(x)
        lower = union

    cfg = GraphSageConfig(num_layers=layers, input_size=d, out_size=h,
                          gcn=gcn, agg_func=agg)
    params = {"layers": [
        {"weight": jnp.asarray(
            getattr(gs, f"sage_layer{i + 1}").weight.detach().numpy())}
        for i in range(layers)]}

    cb = build_compact_batch(graph, np.array(batch), np.random.RandomState(0),
                             num_layers=layers, fanout=fanout, gcn=gcn,
                             sample_sets=sample_sets)
    x0 = jnp.asarray(feats)[jnp.asarray(cb.x0_ids)]
    frontiers = jax.tree_util.tree_map(jnp.asarray, list(cb.frontiers))
    out = np.asarray(graphsage_apply(params, cfg, x0, frontiers))

    np.testing.assert_allclose(out[:len(batch)], out_ref, rtol=2e-5,
                               atol=2e-5)


def test_classifier_parity_with_reference(ref):
    import jax.numpy as jnp

    from graphsage_tpu.models import classifier_apply

    rng = np.random.RandomState(5)
    emb = rng.randn(12, 16).astype(np.float32)
    torch.manual_seed(0)
    clf = ref.Classification(16, 5)
    with torch.no_grad():
        want = clf(torch.FloatTensor(emb)).numpy()
    lin = clf.layer[0]
    params = {"weight": jnp.asarray(lin.weight.detach().numpy()),
              "bias": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(classifier_apply(params, jnp.asarray(emb)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
