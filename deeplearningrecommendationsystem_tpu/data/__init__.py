from deeplearningrecommendationsystem_tpu.data.movielens import MovieLens100K

__all__ = ["MovieLens100K"]
