from graphsage_tpu.models.layers import (
    xavier_uniform,
    init_sage_layer,
    sage_layer_apply,
    init_classifier,
    classifier_apply,
)
from graphsage_tpu.models.graphsage import (
    Frontier,
    GraphSageConfig,
    init_graphsage,
    graphsage_apply,
)
from graphsage_tpu.models.lstm_agg import init_lstm_agg, lstm_aggregate

__all__ = [
    "xavier_uniform",
    "init_sage_layer",
    "sage_layer_apply",
    "init_classifier",
    "classifier_apply",
    "Frontier",
    "GraphSageConfig",
    "init_graphsage",
    "graphsage_apply",
    "init_lstm_agg",
    "lstm_aggregate",
]
