from deeplearningrecommendationsystem_tpu.train.optim import torch_adam
from deeplearningrecommendationsystem_tpu.train.trainer import TrainConfig, Trainer, TrainResult

__all__ = ["torch_adam", "TrainConfig", "Trainer", "TrainResult"]
