"""Array layout conventions.

The native layout of this framework is channels-last, time-major:

    ``(B, T, H, W, C)``  — batch, frames, rows, cols, macroproperty channels

which maps directly onto XLA's NDHWC 3-D convolution layout on TPU (feature
dim last and contiguous, so conv/matmul tiling hits the MXU without
transposes).  The reference PyTorch project instead uses ``(B, C, H, W, T)``
(e.g. /root/reference/utils/dataset.py:48, models/backbones/unet.py:124-167);
the helpers here convert between the two so artifacts (pickles, checkpoints,
metric CSVs) stay interoperable.

Channel order is shared with the reference: ``0 = rho`` (density),
``1 = mu_vx``, ``2 = mu_vy``, ``3 = sigma2_v`` (velocity-norm variance).
"""

from __future__ import annotations

import jax.numpy as jnp

RHO, VX, VY, SIGMA2 = 0, 1, 2, 3

# Axis names for the native layout.
BATCH_AXIS, TIME_AXIS, ROW_AXIS, COL_AXIS, CHANNEL_AXIS = 0, 1, 2, 3, 4


def from_reference(x: jnp.ndarray) -> jnp.ndarray:
    """``(B, C, H, W, T)`` (reference) → ``(B, T, H, W, C)`` (native).

    The permutation (0, 4, 2, 3, 1) is an involution, so ``from_reference``
    and ``to_reference`` are the same transpose; both are kept for clarity.
    """
    return jnp.transpose(x, (0, 4, 2, 3, 1))


def to_reference(x: jnp.ndarray) -> jnp.ndarray:
    """``(B, T, H, W, C)`` (native) → ``(B, C, H, W, T)`` (reference)."""
    return jnp.transpose(x, (0, 4, 2, 3, 1))


def split_past_future(x: jnp.ndarray, past_len: int):
    """Split a ``(B, T, H, W, C)`` window into past / future along time."""
    return x[:, :past_len], x[:, past_len:]


def concat_time(past: jnp.ndarray, future: jnp.ndarray) -> jnp.ndarray:
    """Concatenate past and future frames along the time axis."""
    return jnp.concatenate([past, future], axis=TIME_AXIS)
