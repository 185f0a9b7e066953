from deeplearningrecommendationsystem_tpu.sampling.negative import (
    NegativeSampler,
    negative_sample,
)

__all__ = ["NegativeSampler", "negative_sample"]
