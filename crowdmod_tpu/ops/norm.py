"""GroupNorm(+SiLU) flax wrapper over the fused Pallas kernel.

Drop-in for the reference's ``nn.GroupNorm(8, C)`` (+``nn.SiLU``) pairs
(models/backbones/layers.py:31-41): parameters are held by this module and
the math runs through :func:`crowdmod_tpu.ops.pallas.fused_group_norm`
(one-pass VMEM kernel on TPU, jnp reference elsewhere).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.ops.pallas import fused_group_norm


class GroupNormSiLU(nn.Module):
    """Fused GroupNorm with optional SiLU epilogue (channels-last)."""

    num_groups: int = 8
    epsilon: float = 1e-5
    silu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        out = fused_group_norm(
            x, gamma, beta,
            num_groups=self.num_groups, eps=self.epsilon, silu=self.silu,
        )
        return out.astype(self.dtype)
