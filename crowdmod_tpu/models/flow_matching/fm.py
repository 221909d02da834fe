"""Flow matching: interpolants, training loss, and ODE integrators.

Rebuild of /root/reference/models/flow_matching/flow_matching.py:14-250 with
the samplers collapsed into ``lax.scan`` loops (same treatment as the DDPM
sampler — SURVEY.md §3.5 identifies these Python loops as the hot path).

The velocity predictor reuses the discrete timestep embedding: the continuous
t ∈ [0,1] is scaled by ``TIME_MAX_POS`` before hitting the backbone
(reference :140, :216) — since our embedding is computed from float t, no
``.long()`` truncation is needed, but we keep ``floor`` for numerical parity.

Divergences from the reference (documented, deliberate):
  * the integrator registry maps "Heun" to the actual Heun RK2 sampler — the
    reference maps it to Euler (flow_matching.py:44-47, latent defect);
  * ``conic_interpolant`` guards the (1-t) division with an epsilon — the
    reference divides by zero at t=1 (flow_matching.py:101).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray | None], jnp.ndarray]


def linear_interpolant(x0: jnp.ndarray, x1: jnp.ndarray, t: jnp.ndarray):
    """x_t = x0 + t (x1 - x0); u = x1 - x0.  Reference :90-95."""
    xt = x0 + t * (x1 - x0)
    return xt, x1 - x0


def conic_interpolant(
    x0: jnp.ndarray, x1: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-6
):
    """x_t = t x1 + (1-t) x0; u = (x1 - x_t)/(1-t).  Reference :97-102."""
    xt = t * x1 + (1.0 - t) * x0
    u = (x1 - xt) / jnp.maximum(1.0 - t, eps)
    return xt, u


INTERPOLANTS = {"Linear": linear_interpolant, "Conic": conic_interpolant}


def fm_loss(
    u_fn: DenoiseFn,
    future: jnp.ndarray,
    past: jnp.ndarray | None,
    key: jax.Array,
    *,
    w_type: str = "Linear",
    time_max_pos: int = 1000,
) -> jnp.ndarray:
    """MSE between predicted and interpolant velocity (reference :104-159)."""
    k0, kt = jax.random.split(key)
    x1 = future
    x0 = jax.random.normal(k0, x1.shape, dtype=x1.dtype)
    b = x1.shape[0]
    t = jax.random.uniform(kt, (b,))
    t_b = t.reshape((b,) + (1,) * (x1.ndim - 1))
    xt, u_target = INTERPOLANTS[w_type](x0, x1, t_b)
    u_pred = u_fn(xt, jnp.floor(t * time_max_pos), past)
    return jnp.mean(jnp.square(u_target - u_pred))


def _time_grid(steps: int, time_max_pos: int):
    """linspace(0,1,steps) and its clipped embedding indices (reference
    :215-217 semantics, floor + clamp to time_max_pos-1)."""
    ts = jnp.linspace(0.0, 1.0, steps)
    idx = jnp.clip(jnp.floor(ts * time_max_pos), 0, time_max_pos - 1)
    return ts, idx


def euler_sample(
    u_fn: DenoiseFn,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    *,
    steps: int = 1000,
    time_max_pos: int = 1000,
    x_init: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Euler integration of dx/dt = u from x(0) ~ N(0, I); one scan.

    ``x_init`` overrides the noise draw — used by ReFlow coupling
    generation, which must keep the (x0, x1) endpoints paired.
    """
    x0 = (
        jax.random.normal(key, sample_shape, dtype=jnp.float32)
        if x_init is None else x_init
    )
    delta = 1.0 / steps
    b = sample_shape[0]
    _, idx = _time_grid(steps, time_max_pos)

    def body(x, t_idx):
        u = u_fn(x, jnp.full((b,), t_idx), past)
        return x + delta * u, None

    x, _ = jax.lax.scan(body, x0, idx)
    return x


def heun_sample(
    u_fn: DenoiseFn,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    *,
    steps: int = 500,
    time_max_pos: int = 1000,
) -> jnp.ndarray:
    """Heun (RK2) integration; two denoiser calls per step (reference
    :227-250, including its +1 embedding offset for the second stage)."""
    x0 = jax.random.normal(key, sample_shape, dtype=jnp.float32)
    delta = 1.0 / steps
    b = sample_shape[0]
    _, idx = _time_grid(steps, time_max_pos)

    def body(x, t_idx):
        k1 = u_fn(x, jnp.full((b,), t_idx), past)
        x_tilde = x + delta * k1
        k2 = u_fn(x_tilde, jnp.full((b,), t_idx + 1), past)
        return x + 0.5 * delta * (k1 + k2), None

    x, _ = jax.lax.scan(body, x0, idx)
    return x


INTEGRATORS = {"Euler": euler_sample, "Heun": heun_sample}
