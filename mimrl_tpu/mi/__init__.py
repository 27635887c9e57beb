from mimrl_tpu.mi import bounds
from mimrl_tpu.mi.critics import CriticModel, BaselineModel
from mimrl_tpu.mi.estimators import VMIEstimator, VCMIEstimator, MLPForCMI
from mimrl_tpu.mi.knn import prod_knn_sample
from mimrl_tpu.mi.standalone import (
    compute_mi,
    train_mine,
    sample_correlated_gaussian,
    rho_to_mi,
)

__all__ = [
    "bounds",
    "CriticModel",
    "BaselineModel",
    "VMIEstimator",
    "VCMIEstimator",
    "MLPForCMI",
    "prod_knn_sample",
    "compute_mi",
    "train_mine",
    "sample_correlated_gaussian",
    "rho_to_mi",
]
