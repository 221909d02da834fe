"""Convolutional recurrent cells, channels-last.

Rebuild of /root/reference/models/convRNN/convGRUCell.py:4-68 and
convLSTMCell.py:4-74 on ``(B, H, W, C)`` frames.  State is a uniform
``(h, c)`` tuple pytree for both cell types (GRU carries ``c = None``-shaped
zeros, see :func:`init_state`) so encoder/forecaster code is cell-agnostic —
the reference threads ``(h, None)`` tuples through Python lists instead.

The LSTM computes all four gates with a single fused convolution; the GRU
fuses reset+update into one convolution (the reference uses two separate
convs — algebraically identical concat of output channels, one fewer
HBM-bound op).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def init_state(batch: int, h: int, w: int, hidden: int, dtype=jnp.float32):
    """Zero (h, c) state; c is carried for both cell types for uniformity."""
    z = jnp.zeros((batch, h, w, hidden), dtype)
    return (z, z)


class ConvGRUCell(nn.Module):
    hidden_channels: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state):
        h_prev, c_prev = state
        k = (self.kernel_size, self.kernel_size)
        # padding follows the configurable kernel (k//2 == SAME for odd k);
        # hardcoded (1,1) would shrink H,W for any ENC_KERNELS entry != 3
        # and break the recurrent state shapes.
        pad = self.kernel_size // 2
        conv = lambda feats, name: nn.Conv(
            feats, kernel_size=k, padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias, dtype=self.dtype, name=name,
        )
        combined = jnp.concatenate([x, h_prev], axis=-1)
        # Fused reset|update gates.
        ru = conv(2 * self.hidden_channels, "gates")(combined)
        reset, update = jnp.split(nn.sigmoid(ru), 2, axis=-1)
        cand_in = jnp.concatenate([x, reset * h_prev], axis=-1)
        candidate = nn.tanh(conv(self.hidden_channels, "candidate")(cand_in))
        h_next = (1.0 - update) * candidate + update * h_prev
        return h_next, (h_next, c_prev)


class ConvLSTMCell(nn.Module):
    hidden_channels: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state):
        h_prev, c_prev = state
        k = (self.kernel_size, self.kernel_size)
        combined = jnp.concatenate([x, h_prev], axis=-1)
        pad = self.kernel_size // 2
        gates = nn.Conv(
            4 * self.hidden_channels, kernel_size=k,
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias, dtype=self.dtype, name="gates",
        )(combined)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c_next = nn.sigmoid(f) * c_prev + nn.sigmoid(i) * nn.tanh(g)
        h_next = nn.sigmoid(o) * nn.tanh(c_next)
        return h_next, (h_next, c_next)


CELLS = {"ConvGRUCell": ConvGRUCell, "ConvLSTMCell": ConvLSTMCell}
