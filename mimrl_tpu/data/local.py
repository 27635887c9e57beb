"""'Local' dense datasets (mosi_20/50, mosei_20/50, youtube(v2),
mmmo(v2), moud, pom, iemocap_20) + regression->class bucketers.

The reference imports `DataLoaderLocal` (ref: Solver.py:12,
DataLoaderUniversal.py:7) but the file is ABSENT from the repo, so this
module is reconstructed from the call-site contract:

- ``LocalDataset(mode, dataset, normalize, log_scale)`` yields dense
  ``(t, a, v, label[, label_2[, label_7]])`` samples
  (ref: DataLoaderUniversal.py:82-92 passes them straight to a collate-
  free DataLoader, so features must already be fixed-length arrays);
- feature dims per dataset come from the registry
  (ref: Config.py:75-89);
- `r2c_2` / `r2c_7` / `mosi_r2c_7` / `pom_r2c_7` bucket regression
  scores for metrics (usage: Solver.py:362-399).

On-disk schema owned by this framework (the reference's is unknowable):
``<root>/<dataset>/<mode>.pkl`` holding
``{'text': [n arrays], 'audio': [...], 'video': [...], 'labels': [arr, ...]}``.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from mimrl_tpu.data import registry
from mimrl_tpu.data.pipeline import ArrayDataset
from mimrl_tpu.data.preprocess import apply_standard_pipeline
from mimrl_tpu.data.sdk import pom_r2c_7  # canonical duplicate

LOCAL_DATASETS = [
    "mosi_20", "mosi_50", "mosei_20", "mosei_50", "youtube", "youtubev2",
    "mmmo", "mmmov2", "moud", "pom", "iemocap_20",
]


def r2c_2(a) -> int:
    """Regression score -> binary class (pos vs non-pos), inferred from
    the metric usage at Solver.py:370-371."""
    return int(a > 0)


def r2c_7(a) -> int:
    """Regression score -> 7-class in [0, 6] with clipping to [-3, 3]
    (MOSEI convention; usage: Solver.py:367-368)."""
    return int(np.clip(np.round(a), -3, 3)) + 3


def load_local_dataset(
    dataset: str,
    mode: str,
    normalize=(False, False, False),
    log_scale=(False, False, False),
    data_path: str | None = None,
) -> ArrayDataset:
    assert dataset in LOCAL_DATASETS
    assert mode in ("train", "valid", "test")
    data_path = data_path or registry.Data_path_local
    with open(os.path.join(data_path, dataset, f"{mode}.pkl"), "rb") as f:
        data = pickle.load(f)

    mins = registry.dataset_scales_mins[dataset]
    t = apply_standard_pipeline(
        [np.asarray(x) for x in data["text"]], log_scale[0],
        mins[0] if log_scale[0] else None, normalize[0])
    a = apply_standard_pipeline(
        [np.asarray(x) for x in data["audio"]], log_scale[1],
        mins[1] if log_scale[1] else None, normalize[1])
    v = apply_standard_pipeline(
        [np.asarray(x) for x in data["video"]], log_scale[2],
        mins[2] if log_scale[2] else None, normalize[2])

    labels = [np.asarray(lab) for lab in data["labels"]]
    return ArrayDataset(text_feat=t, audio=a, video=v, labels=labels)
