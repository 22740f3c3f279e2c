"""End-to-end training integration on a small synthetic dataset:
supervised learning must reach high accuracy; unsup and plus_unsup must run
and improve over random.  (Full-scale Cora/Pubmed runs live in bench.py.)"""

import numpy as np
import pytest

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig
from graphsage_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def small_ds():
    return synthetic_power_law(300, 1200, num_feats=32, num_classes=4,
                               seed=3)


def test_supervised_learns(small_ds):
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=32)
    tcfg = TrainConfig(learn_method="sup", epochs=3, b_sz=32,
                       lr=0.5, seed=1, verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg)
    best = tr.fit()
    # 4 classes, random = 0.25; class-correlated features must be learnable
    assert best > 0.5, f"val F1 {best}"


def test_unsup_runs_and_trains_classifier(small_ds):
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=16)
    tcfg = TrainConfig(learn_method="unsup", unsup_loss="normal", epochs=2,
                       b_sz=32, lr=0.1, clf_epochs=30, seed=1, verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg)
    best = tr.fit()
    assert best > 0.3, f"val F1 {best}"  # above random


def test_plus_unsup_margin_runs(small_ds):
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=16)
    tcfg = TrainConfig(learn_method="plus_unsup", unsup_loss="margin",
                       epochs=1, b_sz=32, lr=0.3, seed=1, verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg)
    best = tr.fit()
    assert best > 0.3


def test_max_aggregator_trains(small_ds):
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=32,
                           agg_func="MAX")
    tcfg = TrainConfig(learn_method="sup", epochs=2, b_sz=32, lr=0.5,
                       seed=1, verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg)
    assert tr.fit() > 0.4


def test_lstm_aggregator_trains(small_ds):
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=32,
                           agg_func="LSTM")
    tcfg = TrainConfig(learn_method="sup", epochs=2, b_sz=32, lr=0.5,
                       seed=1, verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg)
    assert tr.fit() > 0.4


def test_checkpoint_callback_fires(small_ds):
    mcfg = GraphSageConfig(num_layers=1, input_size=32, out_size=16)
    calls = []
    tcfg = TrainConfig(learn_method="sup", epochs=1, b_sz=64, seed=1,
                       verbose=False)
    tr = Trainer(small_ds, mcfg, tcfg,
                 checkpoint_fn=lambda trainer, f1: calls.append(f1))
    tr.fit()
    assert len(calls) >= 1
