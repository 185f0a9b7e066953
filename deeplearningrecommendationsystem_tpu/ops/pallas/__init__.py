"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA-equivalent reference implementation in ops/ used for
correctness tests (interpret mode on CPU) and as the automatic fallback on
non-TPU backends. Benchmarks: tools/bench_kernels.py.
"""

from deeplearningrecommendationsystem_tpu.ops.pallas.din_attention import (
    din_attention_pool_pallas,
)
from deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention import (
    afm_attention_pool_pallas,
)
from deeplearningrecommendationsystem_tpu.ops.pallas.gather import gather_rows_pallas
from deeplearningrecommendationsystem_tpu.ops.pallas.serving_topk import (
    topk_scores_pallas,
    topk_serve_matmul,
    topk_two_stage,
)

__all__ = [
    "din_attention_pool_pallas",
    "afm_attention_pool_pallas",
    "gather_rows_pallas",
    "topk_scores_pallas",
    "topk_serve_matmul",
    "topk_two_stage",
]
