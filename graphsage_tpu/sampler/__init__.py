from graphsage_tpu.sampler.compact import CompactBatch, build_compact_batch
from graphsage_tpu.sampler.device import sample_frontiers_dense
from graphsage_tpu.sampler.pairs import PairSampler, PairBatch

__all__ = [
    "CompactBatch",
    "build_compact_batch",
    "sample_frontiers_dense",
    "PairSampler",
    "PairBatch",
]
