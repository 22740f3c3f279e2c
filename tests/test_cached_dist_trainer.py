"""CachedDistTrainer: the reference protocol over the sharded cached
epochs (virtual 8-device mesh)."""

import numpy as np

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig
from graphsage_tpu.train import CachedDistTrainer, TrainConfig


def _mk(learn_method="sup", extend=True, epochs=2, **kw):
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4,
                             seed=11)
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    tcfg = TrainConfig(learn_method=learn_method, epochs=epochs, b_sz=48,
                       fanout=4, seed=3, verbose=False, clf_epochs=10,
                       strict_clf_eval=False, **kw)
    return ds, CachedDistTrainer(ds, mcfg, tcfg, extend_batches=extend)


def test_sup_protocol_fits_and_evaluates():
    _, tr = _mk()
    assert tr.n_dev == 8
    best = tr.fit()
    assert 0.0 <= best <= 1.0
    assert any("val_f1" in h for h in tr.history)
    losses = [h for h in tr.history if "val_f1" in h]
    assert losses


def test_sup_no_extend_learns():
    _, tr = _mk(extend=False, epochs=3)
    l0 = tr.train_epoch()
    tr.epoch = 1
    l1 = tr.train_epoch()
    tr.epoch = 2
    l2 = tr.train_epoch()
    assert np.isfinite([l0, l1, l2]).all()
    assert l2 < l0, (l0, l1, l2)


def test_plus_unsup_protocol_runs():
    _, tr = _mk(learn_method="plus_unsup", epochs=1)
    loss = tr.train_epoch()
    assert np.isfinite(loss)
    tr.evaluate()
    assert tr.history


def test_unsup_b_sz_larger_than_train_split():
    """Forced single-step epochs (train split < one global batch) produce
    ragged per-device chunks; the pair-field stacking must pad them to
    b_loc with zero masks instead of crashing (regression: np.stack
    ValueError on shapes (32,6)/(22,6)/(0,6))."""
    ds = synthetic_power_law(300, 1500, num_feats=16, num_classes=4,
                             seed=11)
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    tcfg = TrainConfig(learn_method="unsup", epochs=1, b_sz=256, fanout=4,
                       seed=5, verbose=False, clf_epochs=5,
                       strict_clf_eval=False)
    tr = CachedDistTrainer(ds, mcfg, tcfg)
    assert tr.tcfg.b_sz > len(ds.train_nodes)  # the ragged regime
    assert np.isfinite(tr.train_epoch())


def test_b_sz_rounds_to_device_grid():
    ds = synthetic_power_law(200, 900, num_feats=12, num_classes=3, seed=2)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    tcfg = TrainConfig(epochs=1, b_sz=20, fanout=3, seed=1, verbose=False)
    tr = CachedDistTrainer(ds, mcfg, tcfg, extend_batches=False)
    assert tr.tcfg.b_sz % tr.n_dev == 0
    assert np.isfinite(tr.train_epoch())
