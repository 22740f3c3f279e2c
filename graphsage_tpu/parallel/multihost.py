"""Multi-host initialization and process-level helpers.

The reference is single-process (src/main.py:36).  On a multi-host TPU pod
slice the JAX-native recipe is:

    from graphsage_tpu.parallel.multihost import initialize
    initialize()                      # jax.distributed across hosts
    mesh = make_global_mesh()         # all chips of the slice, axis 'data'

After `jax.distributed.initialize`, `jax.devices()` spans the slice and
every `Mesh`/`shard_map` program in this framework (halo exchange, DP
gradient pmean) runs unchanged with XLA routing intra-host collectives over
ICI and inter-host legs over DCN.  Each host feeds only its own batch
shards (`process_index` selects rows), which is exactly the layout
`train.distributed.build_dist_batch` emits.

This module is exercised single-process in CI (initialize() is a no-op
there); the multi-host path follows the standard jax.distributed contract
(coordinator address from TPU metadata or env).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process; safe no-op in
    a single-process session.  On Cloud TPU the arguments are discovered
    automatically from the metadata server.

    MUST be called before any other JAX API use (anything that initializes
    the XLA backend) — ordering errors are surfaced, not swallowed, so a
    multi-host job cannot silently degrade into independent single-host
    runs.
    """
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()  # auto-discovery (TPU metadata)
    except ValueError as e:
        # single-process environment: auto-discovery finds no coordinator
        # ("coordinator_address should be defined") — benign no-op.  But
        # if the environment SAYS this is a multi-process job (cluster
        # env vars present) a discovery failure is real: swallowing it
        # would degrade the job into N independent single-host runs, each
        # training the same rows — silently wrong results.
        if coordinator_address or num_processes:
            raise
        if "coordinator_address" not in str(e):
            raise
        import os
        present = [h for h in ("COORDINATOR_ADDRESS",
                               "JAX_COORDINATOR_ADDRESS",
                               "MEGASCALE_COORDINATOR_ADDRESS")
                   if os.environ.get(h)]
        if os.environ.get("JAX_NUM_PROCESSES", "").strip() not in ("", "0",
                                                                   "1"):
            present.append("JAX_NUM_PROCESSES")
        # single-worker TPU VMs set TPU_WORKER_HOSTNAMES=localhost — only
        # a MULTI-host value (comma-separated) implies a multi-process job
        if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
            present.append("TPU_WORKER_HOSTNAMES")
        if present:
            raise RuntimeError(
                f"jax.distributed auto-discovery failed but the "
                f"environment looks multi-process ({present}); refusing "
                f"to continue single-host — pass coordinator_address/"
                f"num_processes/process_id explicitly") from e
    except RuntimeError as e:
        # re-entry is benign (jax 0.9 raises "distributed.initialize
        # should only be called once."); backend-ordering errors are real
        # failures and must propagate
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def make_global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every chip of the (possibly multi-host) slice."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def put_global(arr, mesh: Mesh, spec) -> jax.Array:
    """Place a host array onto a (possibly multi-process) mesh.

    Single-process `jax.device_put` cannot target shardings that span
    non-addressable devices; `make_array_from_callback` is the
    multi-controller-safe construction — every process supplies only the
    shards it can address, and the SPMD program sees one global array.
    The host array must hold the GLOBAL value on every process (true for
    everything this framework builds: batches derive from a shared seed,
    params from a shared PRNGKey).  Works identically single-process.
    """
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def local_batch_rows(global_batch: np.ndarray) -> np.ndarray:
    """Rows of a [n_dev_global, ...] host-built batch that THIS process
    must feed (jax requires each host to provide its addressable shards)."""
    n_local = jax.local_device_count()
    start = jax.process_index() * n_local
    return global_batch[start:start + n_local]
