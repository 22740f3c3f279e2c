from graphsage_tpu.ops.aggregate import (
    gather_rows,
    mean_aggregate,
    max_aggregate,
    sum_aggregate,
    pair_cosine,
)

__all__ = [
    "gather_rows",
    "mean_aggregate",
    "max_aggregate",
    "sum_aggregate",
    "pair_cosine",
]
