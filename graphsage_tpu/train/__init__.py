from graphsage_tpu.train.optim import clip_by_global_norm, sgd_update
from graphsage_tpu.train.metrics import micro_f1
from graphsage_tpu.train.trainer import Trainer, TrainConfig
from graphsage_tpu.train.cached_trainer import CachedTrainer
from graphsage_tpu.train.cached_dist_trainer import CachedDistTrainer

__all__ = [
    "clip_by_global_norm",
    "sgd_update",
    "micro_f1",
    "Trainer",
    "TrainConfig",
    "CachedTrainer",
    "CachedDistTrainer",
]
