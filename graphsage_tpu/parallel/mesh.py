"""Device mesh construction and sharding layouts.

The reference is strictly single-process single-device (src/main.py:36; no
distributed backend anywhere — SURVEY §2).  Scaling here is the JAX-native
GSPMD recipe: build a `Mesh` with named axes, annotate arrays with
`NamedSharding`, and let XLA insert the collectives (all-reduce over ICI for
data-parallel grads, all-gather for tensor-sharded activations).

Axes:
- ``data``  — batch dimension (data parallelism; gradient psum)
- ``model`` — hidden dimension of SageLayer weights / classifier
              (tensor parallelism for wide hidden sizes)

For graph/edge partitioning with halo exchange see parallel/halo.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place model params: SageLayer weights [out, in] sharded over 'model'
    on the out dim (row-parallel: each model shard produces a slice of the
    hidden activations; XLA all-gathers before the next layer's concat),
    classifier weight sharded on its input dim; everything else replicated.
    """
    def place(path, leaf):
        names = {str(getattr(p, "key", getattr(p, "name", p)))
                 for p in path}
        spec = P()
        if leaf.ndim == 2:
            if "layers" in names:
                spec = P("model", None)
            elif "clf" in names:
                spec = P(None, "model")
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
