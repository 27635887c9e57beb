"""Audio/video sequence encoders: bidirectional GRU / LSTM via
``lax.scan``, and a Conv1d path.

TPU re-design of the reference's cuDNN RNN usage (ref: Model.py:247-257,
:437-461). The recurrence is inherently serial in time, so the design
minimizes what is inside the scan and how many scans run:

- the input projection ``x @ W_ih`` for ALL timesteps and BOTH directions
  is hoisted out of the scan as big MXU matmuls;
- forward and backward directions are FUSED into ONE scan: the hidden
  state is ``[2, bs, H]`` and the recurrent matmul is a single batched
  ``[2, bs, H] x [2, H, G*H]`` contraction — one sequential chain per
  layer instead of two;
- inside the scan only that small batched matmul + gate nonlinearities
  remain.

Variable-length masking reproduces torch's
``pack_padded_sequence``/``pad_packed_sequence`` semantics
(ref: Model.py:441-447) with static shapes:

- forward: the hidden state freezes once ``t >= length``;
- backward: the state stays at its zero init until the first valid
  (reversed) step — identical to starting the reverse RNN at
  ``t = length-1``;
- outputs at padded positions are exactly 0 (what pad_packed emits).

Bit-parity with ``torch.nn.GRU/LSTM`` on packed sequences is asserted in
tests/test_encoders.py. The bidirectional outputs of the *last* layer
are summed over directions (ref: Model.py:452-453); inner layers feed
the concat of both directions forward, like torch's stacked
bidirectional RNNs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _uniform_init(fan: int):
    bound = 1.0 / jnp.sqrt(fan)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _RnnDirParams(nn.Module):
    """Parameter container for one direction of one recurrent layer —
    kept as a submodule so the param tree paths (``l{i}_{fwd,bwd}/w_ih``
    etc.) are stable for checkpoints and weight converters."""

    d_in: int
    hidden: int
    n_gates: int

    @nn.compact
    def __call__(self):
        H = self.hidden
        G = self.n_gates
        return (
            self.param("w_ih", _uniform_init(H), (self.d_in, G * H)),
            self.param("w_hh", _uniform_init(H), (H, G * H)),
            self.param("b_ih", _uniform_init(H), (G * H,)),
            self.param("b_hh", _uniform_init(H), (G * H,)),
        )


def _fused_bidir_scan(cell: str, H: int, x_proj: Array, w_hh: Array,
                      b_hh: Array, mask: Array):
    """One fused forward+backward recurrent scan.

    x_proj: [T, D, bs, G*H] (input projections; D = direction slots, odd
    slots already time-reversed). w_hh: [D, H, G*H]. b_hh: [D, G*H].
    mask: [T, D, bs, 1]. Returns outputs [T, D, bs, H] (odd slots still
    reversed in time). D is 2 for one encoder, 4 when two same-config
    encoders are fused into one scan (run_bidir_pair)."""
    D, bs = x_proj.shape[1], x_proj.shape[2]

    def recur(h):
        return (
            jnp.einsum("dbh,dhg->dbg", h, w_hh,
                       preferred_element_type=jnp.promote_types(
                           h.dtype, jnp.float32))
            + b_hh[:, None, :]
        )

    if cell == "gru":
        def step(h, inp):
            xp, mt = inp
            hp = recur(h)
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            h = jnp.where(mt > 0, h_new, h)
            return h, h * (mt > 0)

        h0 = jnp.zeros((D, bs, H), x_proj.dtype)
        # unroll amortizes per-iteration scan overhead over the tiny
        # recurrent matmuls (the serial chain is the bottleneck, not FLOPs)
        _, out = jax.lax.scan(step, h0, (x_proj, mask), unroll=4)
        return out

    def lstm_step(carry, inp):
        h, c = carry
        xp, mt = inp
        hp = recur(h)
        xi, xf, xg, xo = jnp.split(xp, 4, axis=-1)
        hi, hf, hg, ho = jnp.split(hp, 4, axis=-1)
        i = jax.nn.sigmoid(xi + hi)
        f = jax.nn.sigmoid(xf + hf)
        g = jnp.tanh(xg + hg)
        o = jax.nn.sigmoid(xo + ho)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        valid = mt > 0
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        return (h, c), h * valid

    h0 = jnp.zeros((D, bs, H), x_proj.dtype)
    _, out = jax.lax.scan(lstm_step, (h0, h0), (x_proj, mask), unroll=4)
    return out


class BiRnnEncoder(nn.Module):
    """Stacked bidirectional GRU/LSTM with fused-direction scans.
    Returns the last layer's fwd/bwd outputs *summed*
    (ref: Model.py:452-453 splits the 2H concat and sums)."""

    cell: str  # 'gru' | 'lstm'
    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        """x: [bs, T, d_in]; mask: [bs, T] (1 = valid)."""
        H = self.hidden
        n_gates = 3 if self.cell == "gru" else 4
        T = x.shape[1]

        m_f = jnp.swapaxes(mask, 0, 1)[..., None]  # [T, bs, 1]
        m_b = m_f[::-1]
        m = jnp.stack([m_f, m_b], axis=1)  # [T, 2, bs, 1]

        for layer in range(self.num_layers):
            d_in = x.shape[-1]
            pf = _RnnDirParams(d_in, H, n_gates, name=f"l{layer}_fwd")()
            pb = _RnnDirParams(d_in, H, n_gates, name=f"l{layer}_bwd")()
            w_ih = jnp.stack([pf[0], pb[0]])  # [2, d_in, G*H]
            w_hh = jnp.stack([pf[1], pb[1]])  # [2, H, G*H]
            b_ih = jnp.stack([pf[2], pb[2]])  # [2, G*H]
            b_hh = jnp.stack([pf[3], pb[3]])

            # hoisted input projections for both directions (MXU)
            xp = (
                jnp.einsum("btd,zdg->btzg", x, w_ih,
                           preferred_element_type=jnp.promote_types(
                               x.dtype, jnp.float32))
                + b_ih[None, None]
            )  # [bs, T, 2, G*H]
            xp = jnp.moveaxis(xp, 0, 2)  # [T, 2, bs, G*H]
            xp = xp.at[:, 1].set(xp[::-1, 1])  # reverse time for bwd dir

            out = _fused_bidir_scan(self.cell, H, xp, w_hh, b_hh, m)
            fwd = jnp.swapaxes(out[:, 0], 0, 1)  # [bs, T, H]
            bwd = jnp.swapaxes(out[::-1, 1], 0, 1)
            last = layer == self.num_layers - 1
            x = fwd + bwd if last else jnp.concatenate([fwd, bwd], axis=-1)
        return x


def run_bidir_pair(cell: str, hidden: int, num_layers: int,
                   params_a, params_b, x_a: Array, mask_a: Array,
                   x_b: Array, mask_b: Array):
    """Execute TWO same-config BiRnnEncoders (e.g. the audio and video
    towers) as ONE fused scan per layer.

    The two encoders' recurrent chains are independent, but `lax.scan`
    chains serialize on the single TPU core — so running them as
    separate modules costs 2x the serial latency for no reason. Here the
    direction axis of `_fused_bidir_scan` carries FOUR slots
    [a_fwd, a_bwd, b_fwd, b_bwd]: one sequential chain per layer instead
    of two, with each slot an independent [bs,H]x[H,G*H] matmul — the
    same math as the separate calls (equality: tests/test_encoders.py::
    test_run_bidir_pair_matches_separate).

    `params_a`/`params_b` are the encoders' param subtrees
    (``rnn_a``/``rnn_v`` under the model), laid out exactly as
    BiRnnEncoder creates them; input projections stay per-modality
    (their d_in differ). Returns (out_a, out_b), each [bs, T, H]."""
    H = hidden
    n_gates = 3 if cell == "gru" else 4
    del n_gates  # layout comes from the stored params

    def dir_masks(mask):
        m_f = jnp.swapaxes(mask, 0, 1)[..., None]  # [T, bs, 1]
        return m_f, m_f[::-1]

    ma_f, ma_b = dir_masks(mask_a)
    mb_f, mb_b = dir_masks(mask_b)
    m = jnp.stack([ma_f, ma_b, mb_f, mb_b], axis=1)  # [T, 4, bs, 1]

    def proj(x, pf, pb):
        """Hoisted input projections for one modality's two directions;
        identical formulation to BiRnnEncoder.__call__."""
        w_ih = jnp.stack([pf["w_ih"], pb["w_ih"]])  # [2, d_in, G*H]
        b_ih = jnp.stack([pf["b_ih"], pb["b_ih"]])  # [2, G*H]
        xp = (
            jnp.einsum("btd,zdg->btzg", x, w_ih,
                       preferred_element_type=jnp.promote_types(
                           x.dtype, jnp.float32))
            + b_ih[None, None]
        )  # [bs, T, 2, G*H]
        xp = jnp.moveaxis(xp, 0, 2)  # [T, 2, bs, G*H]
        return xp.at[:, 1].set(xp[::-1, 1])  # reverse time for bwd dir

    for layer in range(num_layers):
        paf = params_a[f"l{layer}_fwd"]
        pab = params_a[f"l{layer}_bwd"]
        pbf = params_b[f"l{layer}_fwd"]
        pbb = params_b[f"l{layer}_bwd"]

        xp = jnp.concatenate([proj(x_a, paf, pab), proj(x_b, pbf, pbb)],
                             axis=1)  # [T, 4, bs, G*H]
        w_hh = jnp.stack([paf["w_hh"], pab["w_hh"],
                          pbf["w_hh"], pbb["w_hh"]])  # [4, H, G*H]
        b_hh = jnp.stack([paf["b_hh"], pab["b_hh"],
                          pbf["b_hh"], pbb["b_hh"]])

        out = _fused_bidir_scan(cell, H, xp, w_hh, b_hh, m)
        last = layer == num_layers - 1

        def combine(fwd_col, bwd_col):
            fwd = jnp.swapaxes(out[:, fwd_col], 0, 1)  # [bs, T, H]
            bwd = jnp.swapaxes(out[::-1, bwd_col], 0, 1)
            return (fwd + bwd if last
                    else jnp.concatenate([fwd, bwd], axis=-1))

        x_a = combine(0, 1)
        x_b = combine(2, 3)
    return x_a, x_b


class ConvEncoder(nn.Module):
    """Conv1d(k=3, stride=1, padding=1) over time (ref: Model.py:248-249)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None) -> Array:
        return nn.Conv(self.features, kernel_size=(3,), strides=(1,),
                       padding="SAME", name="conv")(x)


def lengths_from_sequence(x: Array) -> Array:
    """Count of non-all-zero timesteps, clamped to >= 1
    (ref: Utils.py:297-298 + Model.py:429-432)."""
    valid = (jnp.sum(jnp.abs(x), axis=-1) != 0).astype(jnp.int32)  # [bs, T]
    lengths = jnp.sum(valid, axis=1)
    return jnp.maximum(lengths, 1)


def prefix_mask(lengths: Array, T: int) -> Array:
    """[bs, T] mask with 1 for t < length (packed-sequence prefix
    semantics)."""
    pos = jnp.arange(T)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)
