"""Diffusion-Transformer backbones for macroproperty sequences.

TPU-native rebuild of the reference DiT family:

  * :class:`DiT2D`      — per-frame patchify, full attention over T·N tokens
                          (/root/reference/models/backbones/DiT2D.py:130-296);
  * :class:`DiT4DTube`  — full temporal-tube Conv3d patchify, one token per
                          spatial patch (DiT4D.py:139-248);
  * :class:`DiT4DJoint` — partial temporal tube, joint attention over all
                          T_p·N_s tokens (DiT4D_V3.py:154-294);
  * :class:`DiT4DFactorized` — partial tube + factorized attention: spatial
                          self-attention per temporal slot, then temporal
                          cross-attention where only future slots are queries
                          (DiT4D_V4.py:106-375; the DDPM-DiT flagship,
                          ddpm.py:89).

All operate on native layout ``(B, T, H, W, C)``.  Tokens are carried as
``(B, T_p, N_s, D)`` and attention runs with *batched* einsums over the
leading dims — the reference's fold-into-batch reshapes
(DiT4D_V4.py:158-175) are unnecessary and XLA maps the batched attention
straight onto the MXU.  AdaLN-Zero conditioning throughout (zero-init
modulation + zero-init final layer).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.models.backbones.embeddings import TimestepEmbedding
from crowdmod_tpu.models.backbones.remat import maybe_remat
from crowdmod_tpu.ops.attention import MultiHeadAttention

_xavier = nn.initializers.xavier_uniform()
_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN-Zero: x * (1 + scale) + shift, broadcasting (B, D) over tokens."""
    extra = x.ndim - shift.ndim
    shape = shift.shape[:1] + (1,) * extra + shift.shape[1:]
    return x * (1.0 + scale.reshape(shape)) + shift.reshape(shape)


def _gate(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    extra = x.ndim - g.ndim
    return x * g.reshape(g.shape[:1] + (1,) * extra + g.shape[1:])


class AdaLNModulation(nn.Module):
    """SiLU → zero-init Dense producing ``n_params`` (B, D) modulation vectors."""

    n_params: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> list[jnp.ndarray]:
        d = c.shape[-1]
        out = nn.Dense(
            self.n_params * d, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(nn.silu(c))
        return jnp.split(out, self.n_params, axis=-1)


def _gelu_exact() -> bool:
    """Exact (erf) GELU is torch nn.GELU's default and the reference's
    semantics; the tanh approximation diverges at the ~1e-3 activation level
    but is ~30% faster end-to-end on the v5e sampler (PERF.md), and the
    walker e2e quality check shows no regression (VALIDATION.md: +4.0 dB
    trained PSNR under tanh vs +2.7 dB exact at equal epochs).  Default on
    TPU is therefore tanh — the bench measures the shipped default
    (VERDICT round-1 item 5); everywhere else (CPU tests, torch-parity
    oracles) exact remains the default.  CROWDMOD_GELU=exact|tanh
    overrides either way."""
    import os

    mode = os.environ.get("CROWDMOD_GELU")
    if mode is None:
        import jax

        mode = "tanh" if jax.default_backend() == "tpu" else "exact"
    return mode != "tanh"


class Mlp(nn.Module):
    hidden_mult: float
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(int(d * self.hidden_mult), dtype=self.dtype, kernel_init=_xavier)(x)
        h = nn.gelu(h, approximate=not _gelu_exact())
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(d, dtype=self.dtype, kernel_init=_xavier)(h)
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


def _layer_norm(x, dtype):
    # Torch DiT uses LayerNorm(elementwise_affine=False, eps=1e-6).
    return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=dtype)(x)


class DiTBlock(nn.Module):
    """Self-attention DiT block with 6-parameter AdaLN-Zero."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        sh1, sc1, g1, sh2, sc2, g2 = AdaLNModulation(6, dtype=self.dtype)(c)
        h = modulate(_layer_norm(x, self.dtype), sh1, sc1)
        h = MultiHeadAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_rate,
            dtype=self.dtype, kernel_init=_xavier,
        )(h, deterministic=deterministic)
        x = x + _gate(h, g1)
        h = modulate(_layer_norm(x, self.dtype), sh2, sc2)
        h = Mlp(self.mlp_ratio, self.dropout_rate, dtype=self.dtype)(
            h, deterministic=deterministic
        )
        return x + _gate(h, g2)


class DiTBlockFactorized(nn.Module):
    """Spatial self-attention + future-query temporal cross-attention + MLP.

    Token shape ``(B, T_p, N_s, D)``.  Stage 1 attends over N_s with (B, T_p)
    batched; stage 2 attends over T_p with (B, N_s) batched, queries being the
    future slots only and the residual added back to future slots only
    (reference DiT4D_V4.py:141-204).  9-parameter AdaLN-Zero.
    """

    num_heads: int
    query_slot_start: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        qs = self.query_slot_start
        (sh1, sc1, g1, sh2, sc2, g2, sh3, sc3, g3) = AdaLNModulation(
            9, dtype=self.dtype
        )(c)

        # 1. Spatial self-attention: (B, T_p, N_s, D), attention over N_s.
        h = modulate(_layer_norm(x, self.dtype), sh1, sc1)
        h = MultiHeadAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_rate,
            dtype=self.dtype, kernel_init=_xavier, name="spatial_attn",
        )(h, deterministic=deterministic)
        x = x + _gate(h, g1)

        # 2. Temporal cross-attention: (B, N_s, T_p, D), future slots query all.
        xt = jnp.swapaxes(x, 1, 2)
        kv = modulate(_layer_norm(xt, self.dtype), sh2, sc2)
        q = kv[:, :, qs:, :]
        attn = MultiHeadAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout_rate,
            dtype=self.dtype, kernel_init=_xavier, name="temporal_attn",
        )(q, kv, deterministic=deterministic)
        future = xt[:, :, qs:, :] + _gate(attn, g2)
        xt = jnp.concatenate([xt[:, :, :qs, :], future], axis=2)
        x = jnp.swapaxes(xt, 1, 2)

        # 3. MLP over all tokens.
        h = modulate(_layer_norm(x, self.dtype), sh3, sc3)
        h = Mlp(self.mlp_ratio, self.dropout_rate, dtype=self.dtype)(
            h, deterministic=deterministic
        )
        return x + _gate(h, g3)


class FinalLayer(nn.Module):
    """AdaLN-modulated zero-init projection to patch pixels."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        shift, scale = AdaLNModulation(2, dtype=self.dtype)(c)
        h = modulate(_layer_norm(x, self.dtype), shift, scale)
        return nn.Dense(
            self.out_features, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h)


class PatchEmbed4D(nn.Module):
    """(B, T, H, W, C) → (B, T_p, N_s, D) via Conv (t_patch, p, p) tube patches."""

    patch_size: int
    t_patch_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p, pt = self.patch_size, self.t_patch_size
        b, t, h, w, _ = x.shape
        if h % p or w % p or t % pt:
            raise ValueError(
                f"grid ({t},{h},{w}) not divisible by patches (t={pt}, s={p})"
            )
        y = nn.Conv(
            self.hidden_size, kernel_size=(pt, p, p), strides=(pt, p, p),
            padding="VALID", dtype=self.dtype, kernel_init=_xavier,
        )(x)  # (B, T_p, h_p, w_p, D)
        tp, hp, wp = y.shape[1:4]
        return y.reshape(b, tp, hp * wp, self.hidden_size)


def unpatch4d(
    tokens: jnp.ndarray,
    *,
    h_patches: int,
    w_patches: int,
    patch_size: int,
    t_patch_size: int,
    out_channels: int,
) -> jnp.ndarray:
    """(B, T_p, N_s, pt·p·p·C) → (B, T_p·pt, H, W, C)."""
    b, tp, ns, _ = tokens.shape
    p, pt, c = patch_size, t_patch_size, out_channels
    x = tokens.reshape(b, tp, h_patches, w_patches, pt, p, p, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))  # (B, Tp, pt, hp, p, wp, p, C)
    return x.reshape(b, tp * pt, h_patches * p, w_patches * p, c)


class _DiTBase(nn.Module):
    """Shared condition/positional plumbing for the DiT variants."""

    out_channels: int = 3
    grid_rows: int = 12
    grid_cols: int = 36
    past_len: int = 5
    future_len: int = 3
    patch_size: int = 4
    hidden_size: int = 256
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.1
    time_multiple: int = 4
    condition: str = "Past"
    t_max: int = 32
    dtype: jnp.dtype = jnp.float32
    # Per-block jax.checkpoint for activation-memory-bound training
    # (models/backbones/remat.py); same math, fusion-level tolerance.
    remat: bool = False

    def _condition_vec(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = TimestepEmbedding(
            dim=self.hidden_size,
            exp_dim=self.hidden_size * self.time_multiple,
            dtype=self.dtype,
            name="time_emb",
        )(t)
        c = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=_xavier,
            name="time_proj",
        )(emb)
        return nn.silu(c)

    def _concat_input(self, future, past):
        if self.condition == "Past":
            if past is None:
                raise ValueError(
                    "condition='Past' requires past frames; got past=None "
                    "(the reference crashes here too, unet.py:133 — a model "
                    "trained conditionally cannot be sampled unconditionally)"
                )
            return jnp.concatenate([past, future], axis=1), past.shape[1]
        return future, 0

    def _pos_embed(self, tokens: jnp.ndarray, t_slots: int) -> jnp.ndarray:
        """Add learned spatial + temporal embeddings to (B, T_p, N_s, D)."""
        ns = tokens.shape[2]
        spatial = self.param(
            "spatial_pos_embed", _trunc02, (1, 1, ns, self.hidden_size)
        )
        temporal = self.param(
            "temporal_pos_embed", _trunc02, (1, t_slots, 1, self.hidden_size)
        )
        return tokens + spatial.astype(tokens.dtype) + temporal[
            :, : tokens.shape[1]
        ].astype(tokens.dtype)


class DiT2D(_DiTBase):
    """Per-frame patchify; full attention over (T·N) tokens (reference V1)."""

    @nn.compact
    def __call__(self, future, t, past=None, *, deterministic: bool = True):
        x, past_len = self._concat_input(future, past)
        x = x.astype(self.dtype)
        b, t_total = x.shape[0], x.shape[1]
        c = self._condition_vec(t)

        # Frame-wise patchify == tube patchify with t_patch 1.
        tokens = PatchEmbed4D(
            patch_size=self.patch_size, t_patch_size=1,
            hidden_size=self.hidden_size, dtype=self.dtype, name="patch_embed",
        )(x)  # (B, T, N, D)
        tokens = self._pos_embed(tokens, self.t_max)
        ns = tokens.shape[2]
        tokens = tokens.reshape(b, t_total * ns, self.hidden_size)

        block_cls = maybe_remat(DiTBlock, self.remat)
        for i in range(self.depth):
            tokens = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, c, deterministic)

        out_feat = self.out_channels * self.patch_size**2
        tokens = FinalLayer(out_feat, dtype=self.dtype, name="final")(tokens, c)
        out = unpatch4d(
            tokens.reshape(b, t_total, ns, out_feat),
            h_patches=self.grid_rows // self.patch_size,
            w_patches=self.grid_cols // self.patch_size,
            patch_size=self.patch_size,
            t_patch_size=1,
            out_channels=self.out_channels,
        )
        return out[:, past_len:]


class DiT4DJoint(_DiTBase):
    """Partial temporal tube + joint attention over all T_p·N_s tokens (V3)."""

    t_patch_size: int = 2

    @nn.compact
    def __call__(self, future, t, past=None, *, deterministic: bool = True):
        x, past_len = self._concat_input(future, past)
        x = x.astype(self.dtype)
        b = x.shape[0]
        c = self._condition_vec(t)

        tokens = PatchEmbed4D(
            patch_size=self.patch_size, t_patch_size=self.t_patch_size,
            hidden_size=self.hidden_size, dtype=self.dtype, name="patch_embed",
        )(x)  # (B, T_p, N_s, D)
        tp, ns = tokens.shape[1:3]
        tokens = self._pos_embed(tokens, self.t_max // self.t_patch_size)
        tokens = tokens.reshape(b, tp * ns, self.hidden_size)

        block_cls = maybe_remat(DiTBlock, self.remat)
        for i in range(self.depth):
            tokens = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, c, deterministic)

        out_feat = self.t_patch_size * self.out_channels * self.patch_size**2
        tokens = FinalLayer(out_feat, dtype=self.dtype, name="final")(tokens, c)
        out = unpatch4d(
            tokens.reshape(b, tp, ns, out_feat),
            h_patches=self.grid_rows // self.patch_size,
            w_patches=self.grid_cols // self.patch_size,
            patch_size=self.patch_size,
            t_patch_size=self.t_patch_size,
            out_channels=self.out_channels,
        )
        return out[:, past_len:]


class DiT4DTube(DiT4DJoint):
    """Full temporal tube (V2): one token per spatial patch, t_patch = T.

    The reference predicts only the future frames from each token
    (FinalLayer → F·C·p², DiT4D.py:120-137); with t_patch == T_total our
    unpatch emits all frames and the future slice is identical — the past
    positions of the zero-init final layer simply learn nothing.
    Construct via :meth:`DiT4DTube.make` so t_patch == past+future.
    """

    @classmethod
    def make(cls, *, past_len: int, future_len: int, **kw):
        return cls(
            past_len=past_len, future_len=future_len,
            t_patch_size=past_len + future_len, **kw,
        )


class DiT4DFactorized(_DiTBase):
    """Partial tube + factorized spatial/temporal-cross attention (V4)."""

    t_patch_size: int = 4

    @nn.compact
    def __call__(self, future, t, past=None, *, deterministic: bool = True):
        x, past_len = self._concat_input(future, past)
        x = x.astype(self.dtype)
        c = self._condition_vec(t)

        tokens = PatchEmbed4D(
            patch_size=self.patch_size, t_patch_size=self.t_patch_size,
            hidden_size=self.hidden_size, dtype=self.dtype, name="patch_embed",
        )(x)  # (B, T_p, N_s, D)
        tokens = self._pos_embed(tokens, self.t_max // self.t_patch_size)

        # First future temporal slot (reference DiT4D_V4.py:268).  Derived
        # from the runtime past length so it always agrees with the slot
        # boundary _concat_input actually produced.
        query_slot_start = past_len // self.t_patch_size
        block_cls = maybe_remat(DiTBlockFactorized, self.remat)
        for i in range(self.depth):
            tokens = block_cls(
                num_heads=self.num_heads,
                query_slot_start=query_slot_start,
                mlp_ratio=self.mlp_ratio,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, c, deterministic)

        out_feat = self.t_patch_size * self.out_channels * self.patch_size**2
        tokens = FinalLayer(out_feat, dtype=self.dtype, name="final")(tokens, c)
        out = unpatch4d(
            tokens,
            h_patches=self.grid_rows // self.patch_size,
            w_patches=self.grid_cols // self.patch_size,
            patch_size=self.patch_size,
            t_patch_size=self.t_patch_size,
            out_channels=self.out_channels,
        )
        return out[:, past_len:]
