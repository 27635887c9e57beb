"""Native (C++) host-pipeline kernels: build, correctness vs the Python
reference paths."""

import numpy as np
import pytest

from mimrl_tpu import native
from mimrl_tpu.data.pipeline import _pad_stack, _pad_time
from mimrl_tpu.data.tokenizer import SPECIAL_TOKENS, WordPieceTokenizer


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_pad_stack_matches_python(lib):
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=(int(rng.integers(1, 12)), 6)).astype(np.float32)
              for _ in range(10)]
    out = native.pad_stack(arrays, 8)
    assert out is not None
    expected = np.stack([_pad_time(a, 8) for a in arrays])
    assert out.shape == (10, 8, 6)
    assert np.array_equal(out, expected)


def test_gather_matches_numpy(lib):
    rng = np.random.default_rng(1)
    src = rng.normal(size=(20, 4, 3)).astype(np.float32)
    idx = rng.integers(0, 20, size=7)
    out = native.gather(src, idx)
    assert np.array_equal(out, src[idx])


def _vocab_tokens():
    return SPECIAL_TOKENS + [
        "hello", "world", "quick", "##ly", "the", "fox", "jump", "##ed",
        "over", "dog", ".", ",", "!",
    ]


def test_native_tokenizer_matches_python(lib, tmp_path):
    tokens = _vocab_tokens()
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(tokens) + "\n")

    py_tok = WordPieceTokenizer(
        {t: i for i, t in enumerate(tokens)}, lower=True)
    nat = native.NativeWordPiece(
        tokens, py_tok.pad_id, py_tok.unk_id, py_tok.cls_id, py_tok.sep_id)

    texts = [
        "Hello world!",
        "the quick fox jumped over the dog.",
        "quickly, HELLO",
        "unknownword here",
        "",
    ]
    max_len = 12
    n_ids, n_types, n_mask = nat.batch_encode(texts, max_len)
    for i, text in enumerate(texts):
        ids, types, mask = py_tok.encode(text, max_len)
        assert n_ids[i].tolist() == ids, (text, n_ids[i].tolist(), ids)
        assert n_mask[i].tolist() == mask
        assert n_types[i].tolist() == types


def test_tokenizer_auto_attaches_native(lib, tmp_path):
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(_vocab_tokens()) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(str(vocab_path))
    assert getattr(tok, "_native", None) is not None
    ids, types, mask = tok.batch_encode(["hello world"], 8)
    assert ids.shape == (1, 8)
    assert ids[0, 0] == tok.cls_id


def test_pipeline_pad_stack_dispatch(lib):
    arrays = [np.ones((3, 2), np.float32), np.ones((7, 2), np.float32)]
    out = _pad_stack(arrays, 5)
    assert out.shape == (2, 5, 2)
    assert np.allclose(out[0, 3:], 0)
    assert np.allclose(out[1], 1)  # truncated to 5
