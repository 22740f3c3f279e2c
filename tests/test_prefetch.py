"""Host/device overlap (utils/prefetch.py): unit behavior of the bounded
prefetch queue, and bit-identical parity between prefetched and serial
epochs for both Trainer and DistTrainer (the producer consumes the
trainer's RandomState in the same sequential order as the serial loop)."""

import time

import numpy as np
import pytest

import jax

from graphsage_tpu.data import synthetic_power_law
from graphsage_tpu.models import GraphSageConfig
from graphsage_tpu.train import Trainer, TrainConfig
from graphsage_tpu.utils.prefetch import Prefetcher, prefetch


# ------------------------------------------------------------------- unit
def test_prefetcher_yields_all_in_order():
    out = list(Prefetcher(lambda: iter(range(50)), depth=3))
    assert out == list(range(50))


def test_prefetcher_bounded_depth():
    """Producer may run at most depth items ahead of the consumer."""
    produced = []

    def producer():
        for i in range(20):
            produced.append(i)
            yield i

    stream = Prefetcher(producer, depth=2)
    first = next(stream)
    assert first == 0
    time.sleep(0.3)  # let the producer run as far ahead as it can
    # queue cap 2 + the one the producer is blocked trying to put
    assert len(produced) <= 1 + 2 + 1
    assert list(stream) == list(range(1, 20))


def test_prefetcher_propagates_producer_exception():
    def producer():
        yield 1
        raise ValueError("boom")

    stream = Prefetcher(producer, depth=2)
    assert next(stream) == 1
    with pytest.raises(ValueError, match="boom"):
        list(stream)


def test_prefetcher_close_unblocks_producer():
    def producer():
        for i in range(1000):
            yield i

    stream = Prefetcher(producer, depth=1)
    next(stream)
    stream.close()
    assert not stream._thread.is_alive()


def test_prefetch_disabled_is_plain_iterator():
    stream = prefetch(lambda: iter([1, 2, 3]), enabled=False)
    assert not isinstance(stream, Prefetcher)
    assert list(stream) == [1, 2, 3]


# ----------------------------------------------------------------- parity
@pytest.fixture(scope="module")
def ds():
    return synthetic_power_law(300, 1200, num_feats=32, num_classes=4,
                               seed=3)


def _params_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(flat_a, flat_b))


@pytest.mark.parametrize("learn_method,unsup_loss", [
    ("sup", "normal"), ("plus_unsup", "margin")])
def test_trainer_prefetch_parity(ds, learn_method, unsup_loss):
    """prefetch_depth=2 must reproduce the serial epoch bit-for-bit."""
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=16)

    def run(depth):
        tcfg = TrainConfig(learn_method=learn_method,
                           unsup_loss=unsup_loss, epochs=1, b_sz=32,
                           lr=0.3, seed=7, verbose=False,
                           prefetch_depth=depth)
        tr = Trainer(ds, mcfg, tcfg)
        loss = tr.train_epoch()
        return loss, jax.device_get(tr.params)

    loss_serial, p_serial = run(0)
    loss_pre, p_pre = run(2)
    assert loss_serial == loss_pre
    assert _params_equal(p_serial, p_pre)


def test_dist_trainer_prefetch_parity(ds):
    from jax.sharding import Mesh
    from graphsage_tpu.train.dist_trainer import (
        DistTrainConfig,
        DistTrainer,
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("data",))
    mcfg = GraphSageConfig(num_layers=2, input_size=32, out_size=16)

    def run(depth):
        tcfg = DistTrainConfig(learn_method="sup", b_loc=16, epochs=1,
                               lr=0.3, seed=7, verbose=False,
                               prefetch_depth=depth)
        tr = DistTrainer(ds, mcfg, tcfg, mesh=mesh)
        loss = tr.train_epoch()
        return loss, jax.device_get(tr.params)

    loss_serial, p_serial = run(0)
    loss_pre, p_pre = run(2)
    assert loss_serial == loss_pre
    assert _params_equal(p_serial, p_pre)
