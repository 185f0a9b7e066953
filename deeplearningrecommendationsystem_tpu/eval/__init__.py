from deeplearningrecommendationsystem_tpu.eval.pointwise import pointwise_metrics
from deeplearningrecommendationsystem_tpu.eval.ranking import RankingMetrics, ranking_metrics
from deeplearningrecommendationsystem_tpu.eval.recommend import top_k_unseen

__all__ = ["pointwise_metrics", "RankingMetrics", "ranking_metrics", "top_k_unseen"]
