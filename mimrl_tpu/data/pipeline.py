"""Static-shape batch pipeline.

XLA-first replacement for torch DataLoader + collate_fn workers
(ref: DataLoaderCMUSDK.py:53-84, DataLoaderCMUDeclareLab.py:362-443):
every batch has the SAME shapes — ``[bs, time_len, d]`` modality tensors,
``[bs, time_len]`` token ids — so the two jitted train steps compile
exactly once.

Design decisions (documented divergences from the reference):

- The reference pads each batch to the *batch max* sequence length and
  sorts by length; here everything is padded/truncated to the static
  ``time_len`` (already the reference's behavior for the canonical Dec
  recipe) and no sorting is needed.
- Partial final batches are cycle-padded with samples from the epoch
  start, with a ``sample_mask`` marking real rows. Losses/metrics are
  mask-aware, so no sample is double-counted; batch statistics (critic
  matrices) see only real data rows.
- Tokenization happens once at pipeline construction (not per batch) for
  deterministic text; AVEC2019's random-word augmentation
  (ref: Customization.py:66-76) re-tokenizes per epoch from a seeded RNG.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np

from mimrl_tpu.data.tokenizer import WordPieceTokenizer


@dataclass
class ArrayDataset:
    """Variable-length per-sample features + label arrays."""

    # exactly one of text_words / text_feat is set
    text_words: Optional[List[List[str]]] = None
    text_feat: Optional[List[np.ndarray]] = None
    audio: List[np.ndarray] = field(default_factory=list)
    video: List[np.ndarray] = field(default_factory=list)
    # ordered label arrays; the Solver routes per-dataset
    # (ref: Solver.py:272-315)
    labels: List[np.ndarray] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.audio)


def _pad_time(x: np.ndarray, time_len: int) -> np.ndarray:
    """Truncate/zero-pad axis 0 to time_len."""
    x = x[:time_len]
    if x.shape[0] < time_len:
        pad = np.zeros((time_len - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad], axis=0)
    return x.astype(np.float32)


def _pad_stack(arrays, time_len: int) -> np.ndarray:
    """[len_i, d] list -> [n, time_len, d], via the native collation
    kernel (mimrl_tpu/native/collate.cpp) when available."""
    try:
        from mimrl_tpu import native

        out = native.pad_stack(arrays, time_len)
        if out is not None:
            return out
    except Exception:
        pass
    return np.stack([_pad_time(a, time_len) for a in arrays])


class BatchPipeline:
    """Iterates fixed-shape batches over an ArrayDataset.

    Batch dict fields:
      bert_sentences / bert_sentence_types / bert_sentence_att_mask
          [bs, time_len] int32  (text mode)
      text  [bs, time_len, d_t] float32  (feature mode)
      audio [bs, time_len, d_a], video [bs, time_len, d_v]
      labels: list of [bs, ...] arrays
      sample_mask [bs] float32 (1 = real sample)
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        time_len: int,
        tokenizer: Optional[WordPieceTokenizer] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        avec_random_word: bool = False,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.time_len = time_len
        self.tokenizer = tokenizer
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.avec_random_word = avec_random_word
        self._epoch = 0

        n = len(dataset)
        assert n > 0, "empty dataset"
        if drop_last and n >= batch_size:
            self.n_batches = n // batch_size
        else:
            self.n_batches = (n + batch_size - 1) // batch_size

        # Pre-pad modality tensors once (cheap, reused every epoch)
        self._audio = _pad_stack(dataset.audio, time_len)
        self._video = _pad_stack(dataset.video, time_len)
        if dataset.text_feat is not None:
            self._text_feat = _pad_stack(dataset.text_feat, time_len)
        else:
            self._text_feat = None

        self._token_cache = None
        if dataset.text_words is not None and tokenizer is not None \
                and not avec_random_word:
            self._token_cache = self._tokenize(
                [" ".join(w[:time_len]) for w in dataset.text_words])

    def __len__(self) -> int:
        return self.n_batches

    @property
    def num_samples(self) -> int:
        return len(self.ds)

    def _tokenize(self, texts: List[str]):
        return self.tokenizer.batch_encode(texts, self.time_len)

    def _epoch_tokens(self, rng: np.random.Generator):
        if self._token_cache is not None:
            return self._token_cache
        if self.ds.text_words is None:
            return None
        # AVEC2019: one random word per sentence, per epoch
        # (ref: Customization.py:66-76)
        texts = []
        for sample in self.ds.text_words:
            words = []
            for sent in sample[: self.time_len]:
                parts = str(sent).lower().split(" ")
                words.append(parts[rng.integers(0, len(parts))])
            texts.append(" ".join(words))
        return self._tokenize(texts)

    @property
    def static_tensors(self) -> bool:
        """True when every tensor an epoch draws from is fixed across
        epochs (pre-padded modalities, tokenize-at-load or no text) —
        i.e. an epoch is fully described by its index plan. AVEC's
        per-epoch random-word tokenization is the one counterexample."""
        return (self.ds.text_words is None
                or self._token_cache is not None)

    def epoch_index_plan(self, rng: np.random.Generator):
        """The epoch's batch composition as indices: ([NB, bs] int row
        ids into the dataset-order tensors, [NB, bs] float32 sample
        mask). Exactly the shuffle + cycle-pad logic __iter__ executes
        (shared code, so the two can never drift); with static_tensors
        this is ALL the per-epoch information there is — the solver's
        device-side-shuffle fast path ships just this plan to the chip
        instead of re-staging the gathered epoch."""
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)
        idx_rows, mask_rows = [], []
        for b in range(self.n_batches):
            idx = order[b * self.bs:(b + 1) * self.bs]
            mask = np.ones(len(idx), np.float32)
            if len(idx) < self.bs:
                # cycle-pad with epoch-start samples, masked out
                extra = order[: self.bs - len(idx)]
                idx = np.concatenate([idx, extra])
                mask = np.concatenate(
                    [mask, np.zeros(self.bs - len(mask), np.float32)])
            idx_rows.append(idx)
            mask_rows.append(mask)
        return np.stack(idx_rows), np.stack(mask_rows)

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + self._epoch)
        idx_plan, mask_plan = self.epoch_index_plan(rng)
        tokens = self._epoch_tokens(rng)
        self._epoch += 1

        for b in range(self.n_batches):
            idx, mask = idx_plan[b], mask_plan[b]

            batch: Dict = {
                "audio": self._audio[idx],
                "video": self._video[idx],
                "labels": [np.asarray(lab)[idx] for lab in self.ds.labels],
                "sample_mask": mask,
            }
            if tokens is not None:
                ids, types, amask = tokens
                batch["bert_sentences"] = ids[idx]
                batch["bert_sentence_types"] = types[idx]
                batch["bert_sentence_att_mask"] = amask[idx]
            if self._text_feat is not None:
                batch["text"] = self._text_feat[idx]
            yield batch


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run an iterator on a background thread with a bounded queue —
    the double-buffering role of torch DataLoader workers
    (ref: num_workers/pin_memory flags, Parameters.py:18-20). Host batch
    assembly overlaps device compute; exceptions propagate."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
