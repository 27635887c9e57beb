"""Audio/video sequence encoders: bidirectional GRU / LSTM via
``lax.scan``, and a Conv1d path.

TPU re-design of the reference's cuDNN RNN usage (ref: Model.py:247-257,
:437-461). The recurrence is inherently serial in time, so the design
moves every batched matmul *out* of the scan:

- the input projection ``x @ W_ih`` for ALL timesteps is one big
  ``[bs*T, d_in] x [d_in, 3H]`` MXU matmul before the scan;
- inside the scan only the small ``[bs, H] x [H, 3H]`` recurrent matmul
  remains.

Variable-length masking reproduces torch's
``pack_padded_sequence``/``pad_packed_sequence`` semantics
(ref: Model.py:441-447) with static shapes:

- forward pass: the hidden state freezes once ``t >= length``;
- backward pass: the state stays at its zero init until the first valid
  (reversed) step — identical to running the reverse RNN from
  ``t = length-1``;
- outputs at padded positions are exactly 0 (what pad_packed emits).

The bidirectional outputs of the *last* layer are summed over directions
by the caller (ref: Model.py:452-453); inner layers feed the concat of
both directions forward, exactly like torch's stacked bidirectional RNNs.
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


class _RnnDirection(nn.Module):
    """One direction of one recurrent layer."""

    cell: str  # 'gru' | 'lstm'
    hidden: int
    reverse: bool

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        """x: [bs, T, d_in]; mask: [bs, T] (1 = valid). Returns [bs, T, H]."""
        bs, T, d_in = x.shape
        H = self.hidden
        n_gates = 3 if self.cell == "gru" else 4

        w_ih = self.param("w_ih", _uniform_init(H), (d_in, n_gates * H))
        w_hh = self.param("w_hh", _uniform_init(H), (H, n_gates * H))
        b_ih = self.param("b_ih", _uniform_init(H), (n_gates * H,))
        b_hh = self.param("b_hh", _uniform_init(H), (n_gates * H,))

        # Hoist the big matmul out of the recurrence (MXU-friendly).
        x_proj = (
            jnp.einsum("btd,dg->btg", x, w_ih,
                       preferred_element_type=jnp.float32)
            + b_ih
        )
        # time-major for scan
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # [T, bs, G*H]
        m = jnp.swapaxes(mask, 0, 1)[..., None]  # [T, bs, 1]
        if self.reverse:
            x_proj = x_proj[::-1]
            m = m[::-1]

        def gru_step(h, inp):
            xp, mt = inp
            hp = jnp.matmul(h, w_hh, preferred_element_type=jnp.float32) + b_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            h = jnp.where(mt > 0, h_new, h)
            return h, h * (mt > 0)

        def lstm_step(carry, inp):
            h, c = carry
            xp, mt = inp
            hp = jnp.matmul(h, w_hh, preferred_element_type=jnp.float32) + b_hh
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

        h0 = jnp.zeros((bs, H), x_proj.dtype)
        if self.cell == "gru":
            _, out = jax.lax.scan(gru_step, h0, (x_proj, m))
        else:
            _, out = jax.lax.scan(lstm_step, (h0, h0), (x_proj, m))

        if self.reverse:
            out = out[::-1]
        return jnp.swapaxes(out, 0, 1)  # [bs, T, H]


class BiRnnEncoder(nn.Module):
    """Stacked bidirectional GRU/LSTM. Returns the last layer's
    fwd/bwd outputs *summed* (ref: Model.py:452-453 splits the 2H concat
    and sums the directions)."""

    cell: str  # 'gru' | 'lstm'
    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        for layer in range(self.num_layers):
            fwd = _RnnDirection(self.cell, self.hidden, reverse=False,
                                name=f"l{layer}_fwd")(x, mask)
            bwd = _RnnDirection(self.cell, self.hidden, reverse=True,
                                name=f"l{layer}_bwd")(x, mask)
            last = layer == self.num_layers - 1
            x = fwd + bwd if last else jnp.concatenate([fwd, bwd], axis=-1)
        return x


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
