from mimrl_tpu.eval.metrics import (
    calc_metrics,
    calc_metrics_pom,
    ccc_score,
    multiclass_acc,
    rmse_score,
    get_score_from_result,
)

__all__ = [
    "calc_metrics",
    "calc_metrics_pom",
    "ccc_score",
    "multiclass_acc",
    "rmse_score",
    "get_score_from_result",
]
