"""TPU-native CTR / ranking framework.

A brand-new JAX/XLA/Pallas re-design of the capability surface of
WardellZc/DeepLearningRecommendationSystem (see SURVEY.md): the 14-model CTR
zoo (LR, MF, NeuralCF, FFM, Wide&Deep, DeepFM, NFM, AFM, PNN, DeepCrossing,
DCN, U/I-AutoRec, DIN, DIEN), classic collaborative filtering (UserCF /
ItemCF / GDCF), the MovieLens-100k implicit-feedback data pipeline, negative
sampling, full-batch training, pointwise + ranking@k evaluation, and
full-catalog top-K serving -- rebuilt TPU-first:

* pure-functional models (param pytrees + jit-compiled apply fns),
* `lax.scan`-over-epochs training loops compiled to a single XLA program,
* a rejection-free, exactly-uniform negative sampler under `jit`,
* device-side metric kernels (including the reference's quirky definitions),
* `jax.sharding.Mesh` data/model parallelism with row-sharded embeddings,
* Pallas kernels for the hot serving / interaction ops.
"""

__version__ = "0.1.0"

from deeplearningrecommendationsystem_tpu.features import FeatureSpec, ML100K_SPEC

__all__ = ["FeatureSpec", "ML100K_SPEC", "__version__"]
