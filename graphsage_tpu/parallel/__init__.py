from graphsage_tpu.parallel.mesh import make_mesh, shard_params, batch_sharding

__all__ = ["make_mesh", "shard_params", "batch_sharding"]
