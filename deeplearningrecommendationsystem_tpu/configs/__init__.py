from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS, ExperimentConfig

__all__ = ["PRESETS", "ExperimentConfig"]
