"""RNN encoder semantics: packed-sequence-equivalent masking, parity with
torch's nn.GRU/nn.LSTM on identical weights (torch CPU is available in
the test environment; the framework itself never imports torch in the
compute path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.encoders import (
    BiRnnEncoder,
    ConvEncoder,
    lengths_from_sequence,
    prefix_mask,
)


def test_lengths_from_sequence():
    x = np.zeros((2, 5, 3), np.float32)
    x[0, :3] = 1.0
    x[1, :0] = 1.0  # all-zero sequence -> clamped to 1 (ref: Model.py:431)
    lengths = lengths_from_sequence(jnp.asarray(x))
    assert lengths.tolist() == [3, 1]


def test_prefix_mask():
    m = prefix_mask(jnp.asarray([2, 4]), 5)
    assert np.asarray(m).tolist() == [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]


def test_masked_outputs_zero_beyond_length():
    enc = BiRnnEncoder("gru", 8, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 4))
    lengths = jnp.asarray([6, 3, 1])
    mask = prefix_mask(lengths, 6)
    params = enc.init(jax.random.PRNGKey(1), x, mask)
    y = enc.apply(params, x, mask)
    y = np.asarray(y)
    assert np.allclose(y[1, 3:], 0.0)
    assert np.allclose(y[2, 1:], 0.0)
    assert not np.allclose(y[0], 0.0)


def test_short_sequence_independent_of_padding_content():
    """Packed-sequence semantics: values past `length` must not affect
    outputs within the valid prefix."""
    enc = BiRnnEncoder("lstm", 8, 1)
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (1, 6, 4))
    x2 = x1.at[:, 4:].set(99.0)  # corrupt the padding region
    lengths = jnp.asarray([4])
    mask = prefix_mask(lengths, 6)
    params = enc.init(jax.random.PRNGKey(1), x1, mask)
    y1 = enc.apply(params, x1, mask)
    y2 = enc.apply(params, x2, mask)
    assert np.allclose(np.asarray(y1)[:, :4], np.asarray(y2)[:, :4], atol=1e-6)


def _copy_torch_weights(params, torch_rnn, cell, num_layers, hidden):
    """Copy our params into a torch RNN (both directions, all layers)."""
    import torch

    p = params["params"]
    for layer in range(num_layers):
        for direction, tag in ((0, "fwd"), (1, "bwd")):
            ours = p[f"l{layer}_{tag}"]
            suffix = f"_l{layer}" + ("_reverse" if direction else "")
            getattr(torch_rnn, "weight_ih" + suffix).data = torch.tensor(
                np.asarray(ours["w_ih"]).T)
            getattr(torch_rnn, "weight_hh" + suffix).data = torch.tensor(
                np.asarray(ours["w_hh"]).T)
            getattr(torch_rnn, "bias_ih" + suffix).data = torch.tensor(
                np.asarray(ours["b_ih"]))
            getattr(torch_rnn, "bias_hh" + suffix).data = torch.tensor(
                np.asarray(ours["b_hh"]))


@pytest.mark.parametrize("cell,num_layers", [("gru", 2), ("lstm", 1)])
def test_torch_parity_bidirectional(cell, num_layers):
    """Bit-level parity with torch packed-sequence bidirectional RNNs,
    including the direction-sum at the output (ref: Model.py:441-453)."""
    torch = pytest.importorskip("torch")
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    bs, T, d_in, H = 4, 7, 5, 6
    x_np = np.random.default_rng(0).normal(size=(bs, T, d_in)).astype(np.float32)
    lengths = np.asarray([7, 5, 3, 1])
    for i, L in enumerate(lengths):
        x_np[i, L:] = 0.0

    mask = prefix_mask(jnp.asarray(lengths), T)
    enc = BiRnnEncoder(cell, H, num_layers)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np), mask)
    y_ours = np.asarray(enc.apply(params, jnp.asarray(x_np), mask))

    if cell == "gru":
        rnn = torch.nn.GRU(d_in, H, num_layers, bidirectional=True,
                           batch_first=True)
    else:
        rnn = torch.nn.LSTM(d_in, H, num_layers, bidirectional=True,
                            batch_first=True)
    _copy_torch_weights(params, rnn, cell, num_layers, H)

    with torch.no_grad():
        packed = pack_padded_sequence(
            torch.tensor(x_np), torch.tensor(lengths), batch_first=True,
            enforce_sorted=False)
        out_packed, _ = rnn(packed)
        out, _ = pad_packed_sequence(out_packed, batch_first=True,
                                     total_length=T)
    # sum over the two direction halves (ref: Model.py:452-453)
    out = out.numpy()
    y_torch = out[..., :H] + out[..., H:]
    assert np.allclose(y_ours, y_torch, atol=1e-4), (
        np.abs(y_ours - y_torch).max()
    )


def test_conv_encoder_matches_torch_conv1d():
    torch = pytest.importorskip("torch")
    bs, T, d_in, d_out = 2, 9, 4, 6
    x_np = np.random.default_rng(0).normal(size=(bs, T, d_in)).astype(np.float32)
    enc = ConvEncoder(d_out)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    y_ours = np.asarray(enc.apply(params, jnp.asarray(x_np)))

    conv = torch.nn.Conv1d(d_in, d_out, kernel_size=3, stride=1, padding=1)
    kernel = np.asarray(params["params"]["conv"]["kernel"])  # [3, d_in, d_out]
    conv.weight.data = torch.tensor(kernel.transpose(2, 1, 0))
    conv.bias.data = torch.tensor(np.asarray(params["params"]["conv"]["bias"]))
    with torch.no_grad():
        y_torch = conv(torch.tensor(x_np).transpose(1, 2)).transpose(1, 2).numpy()
    assert np.allclose(y_ours, y_torch, atol=1e-5)


@pytest.mark.parametrize("cell,num_layers", [("gru", 2), ("lstm", 1)])
def test_run_bidir_pair_matches_separate(cell, num_layers):
    """The fused two-tower scan (run_bidir_pair) must equal the two
    separate BiRnnEncoder applies — same params, same masks."""
    from mimrl_tpu.models.encoders import run_bidir_pair

    H, T, bs, d_a, d_v = 8, 7, 3, 5, 4
    enc_a = BiRnnEncoder(cell, H, num_layers)
    enc_v = BiRnnEncoder(cell, H, num_layers)
    ka, kv, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    x_a = jax.random.normal(kx, (bs, T, d_a))
    x_v = jax.random.normal(jax.random.fold_in(kx, 1), (bs, T, d_v))
    mask_a = prefix_mask(jnp.asarray([T, 3, 1]), T)
    mask_v = prefix_mask(jnp.asarray([2, T, 4]), T)
    pa = enc_a.init(ka, x_a, mask_a)["params"]
    pv = enc_v.init(kv, x_v, mask_v)["params"]

    ya = enc_a.apply({"params": pa}, x_a, mask_a)
    yv = enc_v.apply({"params": pv}, x_v, mask_v)
    fa, fv = run_bidir_pair(cell, H, num_layers, pa, pv,
                            x_a, mask_a, x_v, mask_v)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(ya),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(yv),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cell,num_layers", [("gru", 2)])
def test_run_bidir_pair_grads_match_separate(cell, num_layers):
    """Gradients through the fused pair must match the separate path."""
    from mimrl_tpu.models.encoders import run_bidir_pair

    H, T, bs, d_a, d_v = 8, 6, 2, 5, 4
    enc_a = BiRnnEncoder(cell, H, num_layers)
    enc_v = BiRnnEncoder(cell, H, num_layers)
    ka, kv, kx = jax.random.split(jax.random.PRNGKey(2), 3)
    x_a = jax.random.normal(kx, (bs, T, d_a))
    x_v = jax.random.normal(jax.random.fold_in(kx, 1), (bs, T, d_v))
    mask_a = prefix_mask(jnp.asarray([T, 3]), T)
    mask_v = prefix_mask(jnp.asarray([2, T]), T)
    pa = enc_a.init(ka, x_a, mask_a)["params"]
    pv = enc_v.init(kv, x_v, mask_v)["params"]

    def loss_sep(ps):
        ya = enc_a.apply({"params": ps[0]}, x_a, mask_a)
        yv = enc_v.apply({"params": ps[1]}, x_v, mask_v)
        return jnp.sum(ya ** 2) + jnp.sum(yv * 3.0)

    def loss_fused(ps):
        fa, fv = run_bidir_pair(cell, H, num_layers, ps[0], ps[1],
                                x_a, mask_a, x_v, mask_v)
        return jnp.sum(fa ** 2) + jnp.sum(fv * 3.0)

    g_sep = jax.grad(loss_sep)((pa, pv))
    g_fused = jax.grad(loss_fused)((pa, pv))
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(g_sep)[0],
            jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
