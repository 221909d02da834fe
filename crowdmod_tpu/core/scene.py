"""The macroproperty scene pytree.

The reference scatters channel-index conventions (0=rho, 1-2=velocity,
3=sigma2) across files (e.g. /root/reference/utils/loss.py:19-33,
models/convRNN/forecaster.py:169).  Here the 4-D crowd state is a typed
pytree, ``MacroScene``, so model/metric code can name fields instead of
slicing magic channel indices — while ``pack``/``unpack`` round-trip to the
dense ``(B, T, H, W, C)`` grids the compute paths run on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from crowdmod_tpu.core import layout


class MacroScene(NamedTuple):
    """Crowd macroproperties over a spatio-temporal grid.

    Fields (all leading dims ``(..., T, H, W)``):
      rho:    per-cell pedestrian density.
      vel:    mean velocity field, trailing dim 2 → (vx, vy).
      sigma2: per-cell velocity-norm variance; ``None`` when working with the
              3-channel subset used by the diffusion/FM models
              (reference train.py:59 — mprops_count = 3 unless ConvRNN).
    """

    rho: jnp.ndarray
    vel: jnp.ndarray
    sigma2: jnp.ndarray | None = None

    @property
    def num_channels(self) -> int:
        return 3 if self.sigma2 is None else 4

    def pack(self) -> jnp.ndarray:
        """→ dense ``(..., T, H, W, C)`` grid in reference channel order."""
        parts = [self.rho[..., None], self.vel]
        if self.sigma2 is not None:
            parts.append(self.sigma2[..., None])
        return jnp.concatenate(parts, axis=-1)

    @classmethod
    def unpack(cls, grid: jnp.ndarray) -> "MacroScene":
        """Build a scene from a dense ``(..., T, H, W, C)`` grid (C in {3, 4})."""
        c = grid.shape[-1]
        if c not in (3, 4):
            raise ValueError(f"expected 3 or 4 macroprop channels, got {c}")
        return cls(
            rho=grid[..., layout.RHO],
            vel=grid[..., layout.VX : layout.VY + 1],
            sigma2=grid[..., layout.SIGMA2] if c == 4 else None,
        )

    def total_density(self) -> jnp.ndarray:
        """Total pedestrian count per frame: sum of rho over the grid."""
        return jnp.sum(self.rho, axis=(-2, -1))
