"""ConvRNN encoder–forecaster, channels-last.

Rebuild of /root/reference/models/convRNN/encoder.py:4-137 and
forecaster.py:5-198.  Topology (per forecast step): re-encode the sliding
observation window through three resolutions (conv → cell → strided conv →
cell → strided conv → cell), then decode (cell → transpose-conv ×2 → cell →
transpose-conv ×2 → cell → conv → conv head), with LeakyReLU(0.2) between
convs.

The three recurrent state slots are *shared* between encoder and forecaster
RNNs — slot 0 lives at H/4 (enc rnn3 + forc rnn1), slot 1 at H/2
(enc rnn2 + forc rnn2), slot 2 at H (enc rnn1 + forc rnn3) — which is the
reference's (implicit) design: its ``hidden_state`` list is written by the
encoder cells and read by the forecaster cells (encoder.py:100-133,
forecaster.py:112-149).  That coupling constrains the channel lists:
``ENC_HIDDEN_CH[1] == FORC_HIDDEN_CH[5]``, ``ENC_HIDDEN_CH[3] ==
FORC_HIDDEN_CH[3]``, ``ENC_HIDDEN_CH[5] == FORC_HIDDEN_CH[1]`` — validated
here instead of failing at runtime.

Loops are Python-unrolled: bounds are tiny static constants (PAST_LEN=5,
FUTURE_LEN=3), and unrolling lets XLA fuse across steps — a ``lax.scan``
would only add carry-threading overhead at this size.  Teacher forcing is a
static trace-time flag (two specializations, no runtime branch).
"""

from __future__ import annotations

from typing import Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.models.convrnn.cells import ConvGRUCell, init_state


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class Encoder(nn.Module):
    """Three-scale recurrent encoder over an observation window.

    __call__ consumes ``(B, T, H, W, C)`` and a 3-slot state list, returns
    the top (H/4) hidden features of the last frame + the updated slots.
    """

    hidden_channels: Sequence[int]  # ENC_HIDDEN_CH, 6 entries
    kernels: Sequence[int]          # ENC_KERNELS, 6 entries
    cell: Type[nn.Module] = ConvGRUCell
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, window: jnp.ndarray, state: list):
        hc = self.hidden_channels
        kz = self.kernels
        # padding k//2 keeps stride-1 convs shape-preserving and stride-2
        # convs at ceil(H/2) for every configured ENC_KERNELS entry (a
        # hardcoded pad of 1 only works for k == 3).
        conv = lambda feats, k, stride, name: nn.Conv(
            feats, kernel_size=(k, k), strides=(stride, stride),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            use_bias=self.use_bias, dtype=self.dtype, name=name,
        )
        cell = lambda feats, k, name: self.cell(
            hidden_channels=feats, kernel_size=k, use_bias=self.use_bias,
            dtype=self.dtype, name=name,
        )

        conv1 = conv(hc[0], kz[0], 1, "conv1")
        rnn1 = cell(hc[1], kz[1], "rnn1")
        down1 = conv(hc[2], kz[2], 2, "down1")
        rnn2 = cell(hc[3], kz[3], "rnn2")
        down2 = conv(hc[4], kz[4], 2, "down2")
        rnn3 = cell(hc[5], kz[5], "rnn3")

        s_full, s_half, s_quarter = state[2], state[1], state[0]
        top = None
        for t in range(window.shape[1]):
            h = _lrelu(conv1(window[:, t]))
            h, s_full = rnn1(h, s_full)
            h = _lrelu(down1(h))
            h, s_half = rnn2(h, s_half)
            h = _lrelu(down2(h))
            top, s_quarter = rnn3(h, s_quarter)

        return top, [s_quarter, s_half, s_full]


class Forecaster(nn.Module):
    """Autoregressive multi-scale forecaster; ``(past, target) → future``.

    Config fields map to MODEL.CONVRNN in configs/*.yml.
    """

    out_channels: int = 4
    enc_hidden_channels: Sequence[int] = (16, 64, 64, 96, 96, 96)
    forc_hidden_channels: Sequence[int] = (96, 96, 96, 96, 96, 64, 16)
    enc_kernels: Sequence[int] = (3, 3, 3, 3, 3, 3)
    forc_kernels: Sequence[int] = (3, 4, 3, 4, 3, 3, 3)
    cell: Type[nn.Module] = ConvGRUCell
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def _validate(self):
        e, f = self.enc_hidden_channels, self.forc_hidden_channels
        if not (e[1] == f[5] and e[3] == f[3] and e[5] == f[1]):
            raise ValueError(
                "shared state slots require ENC_HIDDEN_CH[1,3,5] == "
                f"FORC_HIDDEN_CH[5,3,1]; got enc={list(e)} forc={list(f)}"
            )

    @nn.compact
    def __call__(
        self,
        past: jnp.ndarray,       # (B, P, H, W, C)
        future_len: int | None = None,
        target: jnp.ndarray | None = None,  # (B, F, H, W, C) for teacher forcing
        *,
        teacher_forcing: bool = False,
    ) -> jnp.ndarray:
        self._validate()
        if teacher_forcing and target is None:
            raise ValueError("teacher_forcing=True requires target frames")
        if future_len is None:
            if target is None:
                raise ValueError("need future_len or target to set horizon")
            future_len = target.shape[1]

        fc = self.forc_hidden_channels
        fk = self.forc_kernels
        b, p, h, w, c = past.shape

        cell = lambda feats, k, name: self.cell(
            hidden_channels=feats, kernel_size=k, use_bias=self.use_bias,
            dtype=self.dtype, name=name,
        )
        up = lambda feats, k, name: nn.ConvTranspose(
            feats, kernel_size=(k, k), strides=(2, 2), padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype, name=name,
        )
        conv = lambda feats, k, name: nn.Conv(
            feats, kernel_size=(k, k),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            use_bias=self.use_bias, dtype=self.dtype, name=name,
        )

        encoder = Encoder(
            hidden_channels=self.enc_hidden_channels,
            kernels=self.enc_kernels,
            cell=self.cell, use_bias=self.use_bias, dtype=self.dtype,
            name="encoder",
        )
        frnn1 = cell(fc[1], fk[0], "frnn1")
        fup1 = up(fc[2], fk[1], "fup1")
        frnn2 = cell(fc[3], fk[2], "frnn2")
        fup2 = up(fc[4], fk[3], "fup2")
        frnn3 = cell(fc[5], fk[4], "frnn3")
        fconv4 = conv(fc[6], fk[5], "fconv4")
        head = conv(self.out_channels, fk[6], "head")

        # Shared state slots: [H/4, H/2, H] resolutions.
        state = [
            init_state(b, h // 4, w // 4, fc[1], self.dtype),
            init_state(b, h // 2, w // 2, fc[3], self.dtype),
            init_state(b, h, w, fc[5], self.dtype),
        ]

        window = past
        frames = []
        for t in range(future_len):
            top, state = encoder(window, state)
            x, state[0] = frnn1(top, state[0])
            x = _lrelu(fup1(x))
            x, state[1] = frnn2(x, state[1])
            x = _lrelu(fup2(x))
            x, state[2] = frnn3(x, state[2])
            x = _lrelu(fconv4(x))
            frame = head(x)  # (B, H, W, C) — log-space rho / sigma2
            frames.append(frame)

            if teacher_forcing:
                next_frame = target[:, t]
            else:
                # Density and variance are predicted in log space; exp them
                # before feeding back (reference forecaster.py:165-174).
                next_frame = frame
                for ch in (0, 3):
                    if ch < c:
                        next_frame = next_frame.at[..., ch].set(
                            jnp.exp(frame[..., ch])
                        )
            window = jnp.concatenate(
                [window[:, 1:], next_frame[:, None]], axis=1
            )

        return jnp.stack(frames, axis=1)  # (B, F, H, W, C)
