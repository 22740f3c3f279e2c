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

def test_fetch_with_deadline_healthy_path():
    from graphsage_tpu.utils.obs import fetch_with_deadline

    import jax.numpy as jnp
    assert fetch_with_deadline(jnp.float32(2.5), timeout_s=30.0) == 2.5
    arr = fetch_with_deadline(jnp.arange(3), convert=np.asarray,
                              timeout_s=30.0)
    assert list(arr) == [0, 1, 2]


def test_fetch_with_deadline_raises_on_stall():
    """A wedged fetch (simulated: convert blocks forever) raises
    FetchDeadlineError with a diagnostic dump instead of hanging the
    run silently — the round-3 observed failure mode (a mid-run CLI
    train request futex-waiting on an RPC that never returns)."""
    import io

    from graphsage_tpu.utils.obs import FetchDeadlineError, fetch_with_deadline

    buf = io.StringIO()

    def stall(_):
        time.sleep(30)
        return 0.0

    t0 = time.monotonic()
    try:
        fetch_with_deadline(1.0, label="step 400 loss fetch",
                            timeout_s=0.1, convert=stall, stream=buf)
        raise AssertionError("expected FetchDeadlineError")
    except FetchDeadlineError as e:
        assert "step 400 loss fetch" in str(e)
    assert time.monotonic() - t0 < 5.0, "deadline did not bound the wait"
    out = buf.getvalue()
    assert "wedged" in out and "kill this process" in out


def test_fetch_with_deadline_propagates_worker_error():
    from graphsage_tpu.utils.obs import fetch_with_deadline

    def boom(_):
        raise ValueError("inner failure")

    try:
        fetch_with_deadline(1.0, timeout_s=5.0, convert=boom)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "inner failure" in str(e)


def test_fetch_with_deadline_env_timeout(monkeypatch):
    from graphsage_tpu.utils.obs import FetchDeadlineError, fetch_with_deadline

    import io
    monkeypatch.setenv("GS_FETCH_TIMEOUT_S", "0.1")
    try:
        fetch_with_deadline(1.0, convert=lambda _: time.sleep(30),
                            stream=io.StringIO())
        raise AssertionError("expected FetchDeadlineError")
    except FetchDeadlineError:
        pass


def test_trainer_steady_state_fetch_guarded(monkeypatch):
    """The compact Trainer's bounded-dispatch-window sync and epoch-end
    drain route through fetch_with_deadline: a stalled steady-state fetch
    fails loudly instead of hanging the epoch (VERDICT r03 item 5)."""
    import pytest

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig
    from graphsage_tpu.train import Trainer, TrainConfig
    from graphsage_tpu.utils import obs

    ds = synthetic_power_law(120, 500, num_feats=12, num_classes=3, seed=0)
    mcfg = GraphSageConfig(num_layers=2, input_size=12, out_size=8)
    tcfg = TrainConfig(epochs=1, b_sz=16, fanout=3, seed=1, verbose=False,
                       prefetch_depth=0)
    tr = Trainer(ds, mcfg, tcfg)
    tr.train_epoch()  # healthy epoch passes through the guard untouched

    calls = {"n": 0}

    def wedge_every_sync(value, label="", **kw):
        calls["n"] += 1
        raise obs.FetchDeadlineError(f"simulated wedge: {label}")

    import graphsage_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "fetch_with_deadline",
                        wedge_every_sync)
    tr2 = Trainer(ds, mcfg, tcfg)
    with pytest.raises(obs.FetchDeadlineError, match="simulated wedge"):
        tr2.train_epoch()
    assert calls["n"] >= 1
