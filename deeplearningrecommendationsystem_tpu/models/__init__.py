"""The 14-model CTR zoo (+ serving context), all functional JAX.

Parity map to the reference's ``model/`` directory (SURVEY.md §2.2):
LR, MF, NeuralCF, FFM, WideDeep, DeepFM, NFM, AFM, PNN, DeepCrossing,
DCN (the reference's ``DeepCross``), AutoRec (U- and I- via data
orientation), DIN, DIEN.
"""

from deeplearningrecommendationsystem_tpu.models.afm import AFM
from deeplearningrecommendationsystem_tpu.models.autorec import AutoRec
from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_features,
    catalog_scores_from_history,
    catalog_scores_from_pairs,
)
from deeplearningrecommendationsystem_tpu.models.dcn import DCN
from deeplearningrecommendationsystem_tpu.models.deepcrossing import DeepCrossing
from deeplearningrecommendationsystem_tpu.models.deepfm import DeepFM
from deeplearningrecommendationsystem_tpu.models.dien import DIEN
from deeplearningrecommendationsystem_tpu.models.din import DIN
from deeplearningrecommendationsystem_tpu.models.ffm import FFM
from deeplearningrecommendationsystem_tpu.models.lr import LogisticRegression
from deeplearningrecommendationsystem_tpu.models.mf import MatrixFactorization
from deeplearningrecommendationsystem_tpu.models.neuralcf import NeuralCF
from deeplearningrecommendationsystem_tpu.models.nfm import NFM
from deeplearningrecommendationsystem_tpu.models.pnn import PNN
from deeplearningrecommendationsystem_tpu.models.widedeep import WideDeep

__all__ = [
    "AFM",
    "AutoRec",
    "DCN",
    "DeepCrossing",
    "DeepFM",
    "DIEN",
    "DIN",
    "FFM",
    "LogisticRegression",
    "MatrixFactorization",
    "NeuralCF",
    "NFM",
    "PNN",
    "ServingContext",
    "WideDeep",
    "catalog_scores_from_features",
    "catalog_scores_from_history",
    "catalog_scores_from_pairs",
]
