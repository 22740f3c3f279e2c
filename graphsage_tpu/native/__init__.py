from graphsage_tpu.native.engine import (
    available,
    build_compact_batch_native,
    bfs_closure_native,
    far_lists_native,
    sample_fanout_native,
    uniform_negatives_native,
)

__all__ = [
    "available",
    "build_compact_batch_native",
    "bfs_closure_native",
    "far_lists_native",
    "sample_fanout_native",
    "uniform_negatives_native",
]
