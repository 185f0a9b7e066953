from deeplearningrecommendationsystem_tpu.cf.neighborhood import (
    cf_eval,
    item_cf_recommend,
    load_base_test,
    user_cf_recommend,
)
from deeplearningrecommendationsystem_tpu.cf.gdcf import gdcf_train

__all__ = [
    "cf_eval",
    "item_cf_recommend",
    "load_base_test",
    "user_cf_recommend",
    "gdcf_train",
]
