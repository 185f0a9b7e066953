from deeplearningrecommendationsystem_tpu.ops.linear import (
    embedding_init,
    linear,
    linear_init,
    mlp,
    mlp_init,
    relu_stack,
)
from deeplearningrecommendationsystem_tpu.ops.interactions import (
    fm_cross_term,
    bi_interaction,
    pairwise_products,
    pairwise_inner_products,
)

__all__ = [
    "embedding_init",
    "linear",
    "linear_init",
    "mlp",
    "mlp_init",
    "relu_stack",
    "fm_cross_term",
    "bi_interaction",
    "pairwise_products",
    "pairwise_inner_products",
]
