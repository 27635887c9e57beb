"""Universal dataset dispatcher.

Maps a dataset key to (train, valid, test) BatchPipelines + per-modality
feature dims (ref: DataLoaderUniversal.py:10-95). Shuffle/drop_last
policy mirrors the reference: shuffle only the train split; drop_last
only applies to train (ref: DataLoaderUniversal.py:25-30).
"""

from __future__ import annotations

from typing import Optional, Tuple

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.data import registry
from mimrl_tpu.data.avec import load_avec_dataset
from mimrl_tpu.data.declab import load_dec_dataset
from mimrl_tpu.data.local import LOCAL_DATASETS, load_local_dataset
from mimrl_tpu.data.pipeline import ArrayDataset, BatchPipeline
from mimrl_tpu.data.sdk import load_sdk_dataset
from mimrl_tpu.data.tokenizer import WordPieceTokenizer, build_tokenizer


def uses_raw_text(opt: MimrlConfig) -> bool:
    """True when the text modality is raw strings (tokenized to BERT
    ids); False when it is dense pre-extracted features (glove etc. —
    the LocalDataset family is always dense, Dec is always raw,
    SDK/AVEC follow --text)."""
    if "Dec" in opt.dataset:
        return True
    if opt.dataset in LOCAL_DATASETS:
        return False
    return opt.text == "text"


def get_data_loader(
    opt: MimrlConfig,
    tokenizer: Optional[WordPieceTokenizer] = None,
) -> Tuple[BatchPipeline, BatchPipeline, BatchPipeline, int, int, int]:
    dataset = opt.dataset
    assert dataset in registry.ALL_DATASETS, dataset
    tokenizer = tokenizer or build_tokenizer(opt.bert_vocab)
    data_dir = opt.data_dir

    def make_pipes(train_ds: ArrayDataset, valid_ds: ArrayDataset,
                   test_ds: ArrayDataset, avec_random_word: bool = False):
        kw = dict(batch_size=opt.batch_size, time_len=opt.time_len,
                  tokenizer=tokenizer, seed=opt.seed,
                  avec_random_word=avec_random_word)
        train = BatchPipeline(train_ds, shuffle=True,
                              drop_last=opt.drop_last, **kw)
        valid = BatchPipeline(valid_ds, shuffle=False, drop_last=False, **kw)
        test = BatchPipeline(test_ds, shuffle=False, drop_last=False, **kw)
        return train, valid, test

    if "SDK" in dataset:
        name = dataset.split("_")[0]  # mosi | mosei | pom
        splits = [
            load_sdk_dataset(name, mode, text=opt.text, audio=opt.audio,
                             video=opt.video, normalize=opt.normalize,
                             log_scale=opt.log_scale, data_path=data_dir)
            for mode in ("train", "valid", "test")
        ]
        dims = registry.dataset_dimensions[dataset]
        d_t, d_a, d_v = dims[0][opt.text], dims[1][opt.audio], dims[2][opt.video]
        return (*make_pipes(*splits), d_t, d_a, d_v)

    if "Dec" in dataset:
        splits = [load_dec_dataset(dataset, mode, data_path=data_dir)
                  for mode in ("train", "valid", "test")]
        key = "mosi_dec" if "mosi" in dataset else "mosei_dec"
        d_t, d_a, d_v = registry.dataset_dimensions[key]
        return (*make_pipes(*splits), d_t, d_a, d_v)

    if dataset == "avec2019":
        splits = [
            load_avec_dataset(mode, text=opt.text, audio=opt.audio,
                              video=opt.video, normalize=opt.normalize,
                              log_scale=opt.log_scale, data_path=data_dir)
            for mode in ("train", "valid", "test")
        ]
        dims = registry.dataset_dimensions["avec2019"]
        d_t, d_a, d_v = dims[0][opt.text], dims[1][opt.audio], dims[2][opt.video]
        return (*make_pipes(*splits, avec_random_word=(opt.text == "text")),
                d_t, d_a, d_v)

    if dataset in LOCAL_DATASETS:  # noqa: SIM114 (explicit per-family blocks)
        splits = [
            load_local_dataset(dataset, mode, normalize=opt.normalize,
                               log_scale=opt.log_scale, data_path=data_dir)
            for mode in ("train", "valid", "test")
        ]
        d_t, d_a, d_v = registry.dataset_dimensions[dataset]
        return (*make_pipes(*splits), d_t, d_a, d_v)

    raise NotImplementedError(dataset)


# --------------------------------------------------------------------- #
# Maintenance utilities (ref: DataLoaderUniversal.py:98-152)
# --------------------------------------------------------------------- #

def get_dataset_scales(datasets=None, **cfg_overrides):
    """Scan per-modality min/max over every split of each dataset — the
    tool that produced the frozen tables in `registry`
    (ref: DataLoaderUniversal.py:98-126). Returns {name: (mins, maxs)}."""
    import numpy as np

    datasets = datasets or registry.ALL_DATASETS
    results = {}
    for name in datasets:
        kw = dict(dataset=name, text="glove", audio="covarep",
                  video="facet42", time_len=200, normalize=[False] * 3,
                  log_scale=[False] * 3, batch_size=1024, num_workers=0)
        kw.update(cfg_overrides)
        opt = MimrlConfig(**kw)
        mins = [np.inf] * 3
        maxs = [-np.inf] * 3
        loaders = get_data_loader(opt)[:3]
        for loader in loaders:
            for batch in loader:
                mods = [batch.get("text"), batch["audio"], batch["video"]]
                for i, m in enumerate(mods):
                    if m is None:
                        continue
                    mins[i] = min(mins[i], float(m.min()))
                    maxs[i] = max(maxs[i], float(m.max()))
        results[name] = (mins, maxs)
    return results


def test_all_dataset(datasets=None, **cfg_overrides):
    """Smoke-iterate every dataset's train split and assert the feature
    dims against the registry (ref: DataLoaderUniversal.py:139-152)."""
    datasets = datasets or registry.ALL_DATASETS
    for name in datasets:
        is_avec = name == "avec2019"
        kw = dict(
            dataset=name, text="glove",
            audio="covarep" if not is_avec else "ds",
            video="facet42" if not is_avec else "resnet",
            normalize=[False, True, True], log_scale=[False, True, True],
            time_len=100, batch_size=1024, num_workers=0)
        kw.update(cfg_overrides)
        opt = MimrlConfig(**kw)
        train, _, _, d_t, d_a, d_v = get_data_loader(opt)
        for batch in train:
            assert batch["audio"].shape[-1] == d_a, (name, d_a)
            assert batch["video"].shape[-1] == d_v, (name, d_v)
            break
