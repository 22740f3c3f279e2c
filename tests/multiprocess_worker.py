"""Worker for tests/test_multiprocess.py: one process of a 2-process CPU
jax.distributed job (the SURVEY §4 fake-backend pattern applied across
real process boundaries).

Each process owns 4 virtual CPU devices (8 global), runs the
edge-partitioned halo supervised step through the exact production stack
(multihost.initialize -> make_global_mesh -> build_dist_batch ->
dist_batch_to_device -> make_dist_sup_step), and prints the step losses as
JSON for the parent to compare against the single-process oracle.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from graphsage_tpu.parallel.multihost import (  # noqa: E402
    initialize,
    make_global_mesh,
    put_global,
)

initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
           process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from graphsage_tpu.data import synthetic_power_law  # noqa: E402
from graphsage_tpu.models import GraphSageConfig, init_graphsage  # noqa: E402
from graphsage_tpu.models.layers import init_classifier  # noqa: E402
from graphsage_tpu.parallel.halo import shard_features  # noqa: E402
from graphsage_tpu.train.distributed import (  # noqa: E402
    build_dist_batch,
    dist_batch_to_device,
    make_dist_sup_step,
)

# identical on every process: shared seeds
N_DEV, B_LOC, STEPS = 4 * nproc, 8, 3
ds = synthetic_power_law(96, 500, num_feats=16, num_classes=4, seed=1)
mcfg = GraphSageConfig(num_layers=2, input_size=16, out_size=16)
key = jax.random.PRNGKey(7)
params_host = jax.device_get({
    "sage": init_graphsage(key, mcfg),
    "clf": init_classifier(key, 16, 4),
})

mesh = make_global_mesh()
params = jax.tree_util.tree_map(
    lambda a: put_global(a, mesh, P()), params_host)
feats_sh = put_global(shard_features(ds.features, N_DEV), mesh,
                      P("data", None))
step = make_dist_sup_step(mcfg, mesh, lr=0.5)

rng = np.random.RandomState(0)
losses = []
for it in range(STEPS):
    batch = ds.train_nodes[rng.choice(len(ds.train_nodes), (N_DEV, B_LOC))]
    db = build_dist_batch(ds.graph, ds.labels, batch, 2, fanout=3,
                          seed=100 + it)
    params, loss = step(params, feats_sh, *dist_batch_to_device(db, mesh))
    losses.append(float(jax.device_get(loss)))

w = np.asarray(jax.device_get(
    params["sage"]["layers"][0]["weight"])).astype(np.float64)
print("RESULT " + json.dumps({
    "pid": pid, "losses": losses, "w_sum": float(w.sum()),
    "process_count": jax.process_count(),
}), flush=True)
