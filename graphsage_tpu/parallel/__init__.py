from graphsage_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    batch_sharding,
    replicated,
)
from graphsage_tpu.parallel.halo import (
    plan_halo,
    make_halo_gather,
    shard_features,
)
from graphsage_tpu.parallel.partition import bfs_reorder, relabel_dataset
from graphsage_tpu.parallel.multihost import initialize, make_global_mesh

__all__ = [
    "make_mesh",
    "shard_params",
    "batch_sharding",
    "replicated",
    "plan_halo",
    "make_halo_gather",
    "shard_features",
    "bfs_reorder",
    "relabel_dataset",
    "initialize",
    "make_global_mesh",
]
