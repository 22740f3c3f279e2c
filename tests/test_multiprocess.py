"""Real multi-process distributed test (VERDICT round-1 item 3).

Launches 2 OS processes under jax.distributed (CPU backend, 4 virtual
devices each -> one 8-device global mesh spanning both), runs 3 halo
supervised steps through parallel/multihost.py + train/distributed.py,
and asserts:
- both processes agree on every step loss and on the final weights
  (multi-controller SPMD consistency), and
- the run matches the single-process 8-device oracle bit-for-bit-ish
  (same seeds, same batch construction, same program).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_oracle():
    """The same 3-step run on this process's 8-device virtual mesh."""
    from jax.sharding import Mesh, PartitionSpec as P

    from graphsage_tpu.data import synthetic_power_law
    from graphsage_tpu.models import GraphSageConfig, init_graphsage
    from graphsage_tpu.models.layers import init_classifier
    from graphsage_tpu.parallel.halo import shard_features
    from graphsage_tpu.parallel.multihost import put_global
    from graphsage_tpu.train.distributed import (
        build_dist_batch,
        dist_batch_to_device,
        make_dist_sup_step,
    )

    n_dev, b_loc, steps = 8, 8, 3
    ds = synthetic_power_law(96, 500, num_feats=16, num_classes=4, seed=1)
    mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
    key = jax.random.PRNGKey(7)
    params_host = jax.device_get({
        "sage": init_graphsage(key, mcfg),
        "clf": init_classifier(key, 16, 4),
    })
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), axis_names=("data",))
    params = jax.tree_util.tree_map(
        lambda a: put_global(a, mesh, P()), params_host)
    feats_sh = put_global(shard_features(ds.features, n_dev), mesh,
                          P("data", None))
    step = make_dist_sup_step(mcfg, mesh, lr=0.5)
    rng = np.random.RandomState(0)
    losses = []
    for it in range(steps):
        batch = ds.train_nodes[rng.choice(len(ds.train_nodes),
                                          (n_dev, b_loc))]
        db = build_dist_batch(ds.graph, ds.labels, batch, 2, fanout=3,
                              seed=100 + it)
        params, loss = step(params, feats_sh,
                            *dist_batch_to_device(db, mesh))
        losses.append(float(loss))
    w = np.asarray(params["sage"]["layers"][0]["weight"]).astype(np.float64)
    return losses, float(w.sum())


def test_two_process_distributed_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))

    assert all(r["process_count"] == 2 for r in results)
    # both controllers observed the identical SPMD program results
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["w_sum"], results[1]["w_sum"],
                               rtol=1e-6)

    oracle_losses, oracle_w = _single_process_oracle()
    np.testing.assert_allclose(results[0]["losses"], oracle_losses,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["w_sum"], oracle_w, rtol=1e-5)


def test_initialize_refuses_silent_single_host_degradation(monkeypatch):
    """When cluster env vars say this is a multi-process job, a failed
    jax.distributed auto-discovery must raise instead of silently letting
    every host train solo on the same rows (multihost.initialize used to
    swallow the ValueError unconditionally)."""
    import jax
    import pytest as _pytest

    from graphsage_tpu.parallel import multihost

    def fail_discovery(*a, **k):
        raise ValueError("coordinator_address should be defined.")

    monkeypatch.setattr(jax.distributed, "initialize", fail_discovery)
    # no hints: benign single-process no-op
    for h in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "MEGASCALE_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(h, raising=False)
    multihost.initialize()
    # a SINGLE-worker TPU VM value must not count as a hint (the axon
    # environment sets TPU_WORKER_HOSTNAMES=localhost on one host)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    multihost.initialize()
    # a genuinely multi-host value present: the same failure is now fatal
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with _pytest.raises(RuntimeError, match="multi-process"):
        multihost.initialize()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    with _pytest.raises(RuntimeError, match="multi-process"):
        multihost.initialize()
