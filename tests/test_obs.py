"""Observability utilities: metrics logger + collective-deadlock watchdog
(SURVEY §5 sanitizer row; VERDICT r2 next-round item 9)."""

import io
import json
import time

import numpy as np

import jax

from graphsage_tpu.utils.obs import MetricsLogger, collective_watchdog


def test_metrics_logger_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(str(path))
    log.log("epoch", epoch=0, loss=1.5)
    log.log("eval", val_f1=0.9)
    log.close()
    events = [json.loads(l) for l in path.read_text().splitlines()]
    assert [e["event"] for e in events] == ["epoch", "eval"]
    assert events[0]["loss"] == 1.5


def test_watchdog_silent_when_step_completes():
    buf = io.StringIO()
    with collective_watchdog(timeout_s=5.0, stream=buf) as state:
        pass  # instant "step"
    time.sleep(0.05)
    assert not state["fired"]
    assert buf.getvalue() == ""


def test_watchdog_fires_with_mesh_diagnostics():
    """A hung first step (simulated with sleep) gets a diagnostic dump
    naming the mesh axes, device order, and likely causes — what an
    operator needs when a wrong mesh hangs a real slice."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("data",))
    buf = io.StringIO()
    with collective_watchdog(label="test step", timeout_s=0.05,
                             mesh=mesh, stream=buf) as state:
        time.sleep(0.4)
    assert state["fired"]
    out = buf.getvalue()
    assert "test step" in out
    assert "mesh axes" in out and "'data': 2" in out
    assert "same collectives in the same order" in out


def test_watchdog_env_timeout(monkeypatch):
    monkeypatch.setenv("GS_WATCHDOG_TIMEOUT_S", "0.05")
    buf = io.StringIO()
    with collective_watchdog(stream=buf) as state:
        time.sleep(0.4)
    assert state["fired"]
    assert "0.05s" in buf.getvalue()


def test_dist_trainer_first_step_guarded(monkeypatch):
    """DistTrainer routes its first sharded step through the watchdog
    (fires=false on a healthy mesh, and _warmed flips so later steps skip
    the guard)."""
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train.dist_trainer import DistTrainConfig, DistTrainer

    ds = synthetic_power_law(200, 900, num_feats=16, num_classes=3, seed=0)
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=8)
    tcfg = DistTrainConfig(epochs=1, b_loc=8, fanout=4, seed=1,
                           verbose=False, prefetch_depth=0)
    tr = DistTrainer(ds, mcfg, tcfg)
    assert not tr._warmed
    tr.train_epoch()
    assert tr._warmed


def test_compact_trainer_first_step_warmup_guard():
    """The compact Trainer's first step runs under the warmup watchdog
    (remote first-execution can take minutes; the dump says warmup, not
    hang) and flips _warmed so later steps skip the guard."""
    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig

    ds = synthetic_power_law(120, 500, num_feats=12, num_classes=3, seed=0)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    tcfg = TrainConfig(epochs=1, b_sz=16, fanout=3, seed=1, verbose=False,
                       prefetch_depth=0)
    tr = Trainer(ds, mcfg, tcfg)
    assert not tr._warmed
    tr.train_epoch()
    assert tr._warmed
