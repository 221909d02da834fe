"""3-D UNet denoiser over macroproperty sequences, channels-last.

TPU-native rebuild of the reference UNet
(/root/reference/models/backbones/unet.py:7-167, layers.py:5-96): same
topology — first conv, per-level ResNet blocks with optional attention,
stride-2 downsampling, 2-block bottleneck, skip-concat decoder, GroupNorm(8) +
SiLU head — but expressed in NDHWC layout ``(B, T, H, W, C)`` so every conv
lands on XLA's native TPU conv path and elementwise stages fuse into it.

Conditioning mirrors the reference: past and (noisy) future frames are
concatenated along time, processed jointly, and the future slice of the output
is returned (unet.py:138,166).  Divergence from the reference (documented, not
copied): ``past`` is genuinely optional when ``condition != "Past"`` — the
reference unconditionally dereferences ``past.shape`` (unet.py:133).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.models.backbones.embeddings import TimestepEmbedding
from crowdmod_tpu.models.backbones.remat import maybe_remat
from crowdmod_tpu.ops.attention import MultiHeadAttention
from crowdmod_tpu.ops.conv3d import Conv3DSame
from crowdmod_tpu.ops.norm import GroupNormSiLU


class SpatialAttentionBlock(nn.Module):
    """GroupNorm → MHSA over all (T·H·W) positions → residual.

    Reference layers.py:5-18 (GroupNorm(8) + 4-head MHSA).
    """

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = GroupNormSiLU(num_groups=8, epsilon=1e-5, silu=False, dtype=self.dtype)(x)
        y = y.reshape(b, t * h * w, c)
        y = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype)(y)
        return x + y.reshape(b, t, h, w, c)


class ResnetBlock3D(nn.Module):
    """GN→SiLU→Conv, +time-emb, GN→SiLU→ChannelDropout→Conv, skip, attention.

    Reference layers.py:21-78, including Dropout3d's whole-channel dropout
    semantics (broadcast over T/H/W).
    """

    out_channels: int
    dropout_rate: float = 0.1
    apply_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        conv = lambda name: Conv3DSame(
            self.out_channels, dtype=self.dtype, name=name,
        )
        h = GroupNormSiLU(num_groups=8, epsilon=1e-5, dtype=self.dtype)(x)
        h = conv("conv1")(h)

        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_dense")(
            nn.silu(temb)
        )
        h = h + emb[:, None, None, None, :]

        h = GroupNormSiLU(num_groups=8, epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.Dropout(
            rate=self.dropout_rate, broadcast_dims=(1, 2, 3)
        )(h, deterministic=deterministic)
        h = conv("conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, kernel_size=(1, 1, 1), dtype=self.dtype,
                name="match_input",
            )(x)
        h = h + x

        if self.apply_attention:
            h = SpatialAttentionBlock(dtype=self.dtype)(h)
        return h


class DownSample3D(nn.Module):
    """Stride-2 conv over (T, H, W); torch padding=1 semantics."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.channels, kernel_size=(3, 3, 3), strides=(2, 2, 2),
            padding=((1, 1), (1, 1), (1, 1)), dtype=self.dtype,
        )(x)


class UpSample3D(nn.Module):
    """Nearest ×2 upsample over (T, H, W) then 3×3×3 conv."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for axis in (1, 2, 3):
            x = jnp.repeat(x, 2, axis=axis)
        return Conv3DSame(self.channels, dtype=self.dtype)(x)


class UNet3D(nn.Module):
    """UNet denoiser; forward signature ``(future, t, past) → eps_hat``.

    Config fields map 1:1 to the reference's ``MODEL.*.UNET`` YAML node
    (configs/ATC.yml MODEL.DDPM.UNET).
    """

    out_channels: int = 3
    num_res_blocks: int = 1
    base_channels: int = 32
    base_channels_multiples: Sequence[int] = (1, 2, 4)
    apply_attention: Sequence[bool] = (False, False, True, False)
    dropout_rate: float = 0.1
    time_multiple: int = 4
    condition: str = "Past"
    dtype: jnp.dtype = jnp.float32
    # Per-resblock jax.checkpoint for activation-memory-bound training
    # (models/backbones/remat.py); same math, fusion-level tolerance.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        future: jnp.ndarray,
        t: jnp.ndarray,
        past: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.condition == "Past":
            if past is None:
                raise ValueError(
                    "condition='Past' requires past frames; got past=None "
                    "(the reference crashes here too, unet.py:133 — a model "
                    "trained conditionally cannot be sampled unconditionally)"
                )
            past_len = past.shape[1]
            x = jnp.concatenate([past, future], axis=1)
        else:
            past_len = 0
            x = future
        x = x.astype(self.dtype)

        temb_dim = self.base_channels * self.time_multiple
        temb = TimestepEmbedding(
            dim=self.base_channels, exp_dim=temb_dim, dtype=self.dtype
        )(t)

        block_cls = maybe_remat(ResnetBlock3D, self.remat)
        resblock = lambda ch, attn, name: block_cls(
            out_channels=ch, dropout_rate=self.dropout_rate,
            apply_attention=attn, dtype=self.dtype, name=name,
        )

        h = Conv3DSame(self.base_channels, dtype=self.dtype, name="first")(x)
        skips = [h]

        num_levels = len(self.base_channels_multiples)
        for level in range(num_levels):
            ch = self.base_channels * self.base_channels_multiples[level]
            for i in range(self.num_res_blocks):
                h = resblock(ch, self.apply_attention[level], f"enc_{level}_{i}")(
                    h, temb, deterministic
                )
                skips.append(h)
            if level != num_levels - 1:
                h = DownSample3D(h.shape[-1], dtype=self.dtype, name=f"down_{level}")(h)
                skips.append(h)

        h = resblock(h.shape[-1], True, "mid_0")(h, temb, deterministic)
        h = resblock(h.shape[-1], False, "mid_1")(h, temb, deterministic)

        for level in reversed(range(num_levels)):
            ch = self.base_channels * self.base_channels_multiples[level]
            for i in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = resblock(ch, self.apply_attention[level], f"dec_{level}_{i}")(
                    h, temb, deterministic
                )
            if level != 0:
                h = UpSample3D(h.shape[-1], dtype=self.dtype, name=f"up_{level}")(h)

        h = GroupNormSiLU(num_groups=8, epsilon=1e-5, dtype=self.dtype, name="final_norm")(h)
        h = Conv3DSame(self.out_channels, dtype=jnp.float32, name="final_conv")(h)

        return h[:, past_len:] if past_len else h
