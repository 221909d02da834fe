"""Diffusion noise schedules and the forward (q) process.

Functional rebuild of the reference's ``ForwardSampler``/``DDPM.step``
(/root/reference/models/diffusion/forward.py:9-37, models/diffusion/ddpm.py:23-38):
a linear beta schedule ``beta_t = linspace(scale*1e-4, scale*2e-2, T)`` with the
derived closed-form buffers, the q-sample ``x_t = sqrt(abar_t) x_0 +
sqrt(1-abar_t) eps``, and the ancestral reverse update.  Everything is a pure
function over a ``DiffusionSchedule`` NamedTuple of arrays, so schedules live
on-device and index lookups are gathers inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """Precomputed per-timestep buffers; all shape ``(timesteps,)`` float32."""

    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_bar: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    sqrt_one_minus_alpha_bar: jnp.ndarray
    one_by_sqrt_alpha: jnp.ndarray

    @property
    def timesteps(self) -> int:
        return self.beta.shape[0]


def linear_schedule(
    timesteps: int = 1000,
    scale: float = 1.0,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> DiffusionSchedule:
    """Linear beta schedule with the reference's scaling convention."""
    beta = jnp.linspace(
        scale * beta_start, scale * beta_end, timesteps, dtype=jnp.float32
    )
    alpha = 1.0 - beta
    alpha_bar = jnp.cumprod(alpha)
    return DiffusionSchedule(
        beta=beta,
        alpha=alpha,
        alpha_bar=alpha_bar,
        sqrt_alpha_bar=jnp.sqrt(alpha_bar),
        sqrt_one_minus_alpha_bar=jnp.sqrt(1.0 - alpha_bar),
        one_by_sqrt_alpha=1.0 / jnp.sqrt(alpha),
    )


def _bcast(coef: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast over trailing dims.

    ``t`` may be scalar or ``(B,)``; result broadcasts against an
    ``ndim``-dimensional batch of samples.
    """
    c = coef[t]
    return c.reshape(c.shape + (1,) * (ndim - c.ndim))


def q_sample(
    sched: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
):
    """Sample from q(x_t | x_0); returns ``(x_t, eps)``.

    Parity with reference forward.py:29-37.
    """
    eps = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    mean = _bcast(sched.sqrt_alpha_bar, t, x0.ndim) * x0
    std = _bcast(sched.sqrt_one_minus_alpha_bar, t, x0.ndim)
    return mean + std * eps, eps


def ddpm_reverse_step(
    sched: DiffusionSchedule,
    eps_pred: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
):
    """One ancestral reverse step x_t → x_{t-1} (DDPM Algorithm 2).

    Returns ``(x_prev, sigma_t, alpha_t)`` matching the reference's
    ``DDPM.step`` (ddpm.py:23-38).  ``t`` is a traced scalar so this is usable
    as a ``lax.scan`` body; the z-noise is zeroed at t == 0 via ``where``
    rather than Python control flow.
    """
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    z = jnp.where(t > 0, z, jnp.zeros_like(z))
    beta_t = _bcast(sched.beta, t, x.ndim)
    x_prev = _bcast(sched.one_by_sqrt_alpha, t, x.ndim) * (
        x - beta_t / _bcast(sched.sqrt_one_minus_alpha_bar, t, x.ndim) * eps_pred
    ) + jnp.sqrt(beta_t) * z
    return x_prev, jnp.sqrt(beta_t), 1.0 - beta_t


def ddim_tau_schedule(timesteps: int, divider: int) -> jnp.ndarray:
    """The reference's DDIM tau subset: ``arange(0, T-1, divider)``
    (ddpm.py:326)."""
    return jnp.arange(0, timesteps - 1, divider, dtype=jnp.int32)


def respaced_taus(timesteps: int, steps: int) -> jnp.ndarray:
    """Ascending ``(steps,)`` int32 tau grid 0 ... T-1 for respaced sampling.

    Unlike the reference's ``arange(0, T-1, divider)`` (which never visits
    the terminal noise level), this grid always includes both endpoints so
    the chain starts at the x_T the model was trained to denoise.  Used by
    the textbook eta-DDIM / respaced-ancestral sampler.
    """
    if not 1 <= steps <= timesteps:
        raise ValueError(
            f"steps must be in [1, timesteps={timesteps}]; got {steps}"
        )
    if steps == 1:
        return jnp.array([timesteps - 1], dtype=jnp.int32)
    # Host-side (numpy) grid construction: the grid is trace-static — it is
    # the scan's xs — and np.unique's data-dependent length is fine here.
    import numpy as np

    taus = np.unique(
        np.linspace(0, timesteps - 1, steps).round().astype(np.int32)
    )
    return jnp.asarray(taus)
