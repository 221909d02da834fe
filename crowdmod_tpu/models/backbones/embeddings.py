"""Diffusion-timestep embeddings.

The reference precomputes a sinusoidal table and indexes it through an
``nn.Embedding`` followed by Linear→SiLU→Linear
(/root/reference/models/backbones/embeddings.py:6-34).  On TPU a gather from a
(1000, D) table is strictly worse than recomputing the sinusoid on the fly —
the angles are a tiny outer product that XLA fuses into the surrounding MLP —
and computing from a *float* timestep generalizes cleanly to flow-matching's
continuous t (the reference has to round FM's t to reuse its integer table,
flow_matching.py:140).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """``(B,) → (B, dim)`` sinusoid, matching the reference table at integer t.

    Frequencies: exp(-log(10000) * i / (dim/2 - 1)), half sin / half cos.
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1))
    )
    angles = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class TimestepEmbedding(nn.Module):
    """sinusoid(dim) → Dense(exp_dim) → SiLU → Dense(exp_dim)."""

    dim: int
    exp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_embedding(t, self.dim).astype(self.dtype)
        emb = nn.Dense(self.exp_dim, dtype=self.dtype, name="expand")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.exp_dim, dtype=self.dtype, name="project")(emb)
