"""Real-content loader branches exercised on fixture files, with parity
asserted against the ACTUAL reference parser (reference
src/dataCenter.py:14-97) loaded from the read-only mount.

The mount lacks the big content files (cora.content, NODE.paper.tab — see
.MISSING_LARGE_BLOBS), so production runs use the synthesized-content
branch; these tests write tmp-dir fixtures in the documented formats
(cora/README; the pubmed format implied by src/dataCenter.py:61-72) so the
real-content branches of data/loaders.py are covered and proven equivalent
to the reference's DataCenter on the same bytes, including the quirks:
first-seen label_map order, file-order node_map, `label=K`−1, the
`:`-split feat_map with width len(feat_map)−2, and the trailing-summary
column drop.
"""

import importlib.util
import os

import numpy as np
import pytest

from graphsage_tpu.data.loaders import load_cora, load_pubmed

REF_DATACENTER = "/root/reference/src/dataCenter.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_DATACENTER),
                                reason="reference mount absent")

CORA_CONTENT = """\
31336\t0\t1\t0\t0\t1\tNeural_Networks
1061127\t1\t0\t0\t0\t0\tRule_Learning
1106406\t0\t0\t1\t1\t0\tNeural_Networks
13195\t0\t1\t1\t0\t0\tReinforcement_Learning
37879\t1\t1\t0\t1\t1\tRule_Learning
1126012\t0\t0\t0\t0\t1\tNeural_Networks
"""

CORA_CITES = """\
31336\t1061127
31336\t1106406
1061127\t13195
13195\t37879
37879\t1126012
1126012\t31336
"""

# Format implied by src/dataCenter.py:61-72: header 1 skipped; header 2 is
# `:`-split tokens (label first, summary last); data rows are
# <id>\tlabel=K\tw-word=val...\t<summary col, dropped by info[2:-1]>.
PUBMED_CONTENT = (
    "PUBMED_FIXTURE\tNODE\tpaper\n"
    "cat=label:label\tnumeric:w-alpha:0.0\tnumeric:w-beta:0.0"
    "\tnumeric:w-gamma:0.0\tstring:summary:summary\n"
    "19127292\tlabel=2\tw-alpha=0.4\tw-gamma=0.125\tsummary=lorem ipsum\n"
    "17363749\tlabel=1\tw-beta=0.75\tsummary=foo\n"
    "19668377\tlabel=3\tw-alpha=0.2\tw-beta=0.3\tw-gamma=0.5\tsummary=bar\n"
    "17293876\tlabel=1\tsummary=no words at all\n"
)

PUBMED_CITES = (
    "DIRECTED\tcites\n"
    "NO_FEATURES\n"
    "33824\tpaper:19127292\t|\tpaper:17363749\n"
    "37511\tpaper:19668377\t|\tpaper:17293876\n"
    "40000\tpaper:17363749\t|\tpaper:19668377\n"
    "40001\tpaper:19127292\t|\tpaper:17293876\n"
)


@pytest.fixture(scope="module")
def ref_datacenter():
    spec = importlib.util.spec_from_file_location("ref_dc", REF_DATACENTER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DataCenter


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _adj_as_sets(graph):
    return {v: set(int(u) for u in graph.neighbors(v))
            for v in range(graph.num_nodes)}


def test_cora_fixture_parity_with_reference(tmp_path, ref_datacenter):
    content = _write(tmp_path, "cora.content", CORA_CONTENT)
    cites = _write(tmp_path, "cora.cites", CORA_CITES)

    np.random.seed(824)  # the reference splits via the global np RNG
    dc = ref_datacenter({"file_path.cora_content": content,
                         "file_path.cora_cite": cites})
    dc.load_dataSet("cora")

    ds = load_cora(root=str(tmp_path), seed=824)

    assert not ds.synthetic_features
    assert ds.num_nodes == 6
    np.testing.assert_array_equal(ds.features,
                                  dc.cora_feats.astype(np.float32))
    np.testing.assert_array_equal(ds.labels, dc.cora_labels)
    # first-seen label order: Neural_Networks=0, Rule_Learning=1, Reinf.=2
    np.testing.assert_array_equal(ds.labels, [0, 1, 0, 2, 1, 0])
    assert ds.num_classes == 3
    assert _adj_as_sets(ds.graph) == dict(dc.cora_adj_lists)
    # splits follow the same permutation stream
    np.testing.assert_array_equal(np.sort(ds.test_nodes),
                                  np.sort(dc.cora_test))
    np.testing.assert_array_equal(np.sort(ds.val_nodes),
                                  np.sort(dc.cora_val))
    np.testing.assert_array_equal(np.sort(ds.train_nodes),
                                  np.sort(dc.cora_train))


def test_cora_fixture_feature_values(tmp_path):
    _write(tmp_path, "cora.content", CORA_CONTENT)
    _write(tmp_path, "cora.cites", CORA_CITES)
    ds = load_cora(root=str(tmp_path), seed=824)
    # node_map is content-file order: row 0 is paper 31336
    np.testing.assert_array_equal(ds.features[0], [0, 1, 0, 0, 1])
    np.testing.assert_array_equal(ds.features[4], [1, 1, 0, 1, 1])
    assert ds.features.dtype == np.float32


def test_pubmed_fixture_parity_with_reference(tmp_path, ref_datacenter):
    content = _write(tmp_path, "Pubmed-Diabetes.NODE.paper.tab",
                     PUBMED_CONTENT)
    cites = _write(tmp_path, "Pubmed-Diabetes.DIRECTED.cites.tab",
                   PUBMED_CITES)

    np.random.seed(824)
    dc = ref_datacenter({"file_path.pubmed_paper": content,
                         "file_path.pubmed_cites": cites})
    dc.load_dataSet("pubmed")

    ds = load_pubmed(root=str(tmp_path), seed=824)

    assert not ds.synthetic_features
    assert ds.num_nodes == 4
    np.testing.assert_array_equal(ds.features,
                                  dc.pubmed_feats.astype(np.float32))
    np.testing.assert_array_equal(ds.labels, dc.pubmed_labels)
    assert _adj_as_sets(ds.graph) == dict(dc.pubmed_adj_lists)
    np.testing.assert_array_equal(np.sort(ds.test_nodes),
                                  np.sort(dc.pubmed_test))
    np.testing.assert_array_equal(np.sort(ds.val_nodes),
                                  np.sort(dc.pubmed_val))
    np.testing.assert_array_equal(np.sort(ds.train_nodes),
                                  np.sort(dc.pubmed_train))


def test_pubmed_fixture_quirks(tmp_path):
    _write(tmp_path, "Pubmed-Diabetes.NODE.paper.tab", PUBMED_CONTENT)
    _write(tmp_path, "Pubmed-Diabetes.DIRECTED.cites.tab", PUBMED_CITES)
    ds = load_pubmed(root=str(tmp_path), seed=824)
    # label=K − 1
    np.testing.assert_array_equal(ds.labels, [1, 0, 2, 0])
    # feature width = len(feat_map) − 2 = 3 (label + summary excluded);
    # feat_map order: w-alpha=0, w-beta=1, w-gamma=2
    assert ds.features.shape == (4, 3)
    np.testing.assert_allclose(ds.features[0], [0.4, 0.0, 0.125])
    np.testing.assert_allclose(ds.features[1], [0.0, 0.75, 0.0])
    np.testing.assert_allclose(ds.features[2], [0.2, 0.3, 0.5])
    np.testing.assert_allclose(ds.features[3], [0.0, 0.0, 0.0])
    # undirected-ized edges from paper:A | paper:B rows
    adj = _adj_as_sets(ds.graph)
    assert adj[0] == {1, 3} and adj[2] == {1, 3}


def _cora_fixture_graph(tmp_path, n=60, n_feats=8, seed=0):
    """A real-FORMAT cora fixture big enough to train on: binary word
    vectors + class labels in content-file order, cites pairs."""
    rng = np.random.RandomState(seed)
    classes = ["Neural_Networks", "Rule_Learning", "Reinforcement_Learning"]
    content, cites = [], []
    for i in range(n):
        words = rng.randint(0, 2, n_feats)
        content.append(f"{1000 + i}\t" + "\t".join(map(str, words))
                       + f"\t{classes[i % 3]}")
    for i in range(n):
        for j in rng.choice(n, 3, replace=False):
            if int(j) != i:
                cites.append(f"{1000 + i}\t{1000 + int(j)}")
    _write(tmp_path, "cora.content", "\n".join(content) + "\n")
    _write(tmp_path, "cora.cites", "\n".join(cites) + "\n")


def test_real_content_end_to_end_training(tmp_path):
    """The turnkey real-content path (VERDICT r03 item 8): real-FORMAT
    files in a custom --data_root take the real branch all the way through
    load_dataset -> Trainer for a full epoch + eval — the exact recipe
    that runs the day the real cora.content lands (README 'Real data')."""
    _cora_fixture_graph(tmp_path)

    from graphsage_tpu.data import load_dataset
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig

    ds = load_dataset("cora", seed=824, root=str(tmp_path))
    assert not ds.synthetic_features, "fixture must take the REAL branch"
    assert ds.num_nodes == 60 and ds.feature_dim == 8

    mcfg = GraphSageConfig(num_layers=2, input_size=8, out_size=8)
    tcfg = TrainConfig(epochs=1, b_sz=8, fanout=3, seed=824, verbose=False,
                       prefetch_depth=0)
    tr = Trainer(ds, mcfg, tcfg)
    tr.fit()
    assert 0.0 <= tr.max_vali_f1 <= 1.0

    # and through the public CLI with --data_root (the documented command)
    from graphsage_tpu.cli import main
    rc = main(["--dataSet", "cora", "--data_root", str(tmp_path),
               "--epochs", "1", "--b_sz", "8", "--fanout", "3",
               "--hidden", "8", "--quiet"])
    assert rc == 0
