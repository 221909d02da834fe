"""ReFlow (rectified flow) for the flow-matching family.

Beyond-reference capability, the FM-side twin of DDPM progressive
distillation (``models/diffusion/distill.py``): Liu, Gong & Liu (ICLR
2023), "Flow Straight and Fast".  A trained velocity field transports
noise x0 to data x1 along *curved* ODE trajectories — accurate integration
needs many Euler steps.  ReFlow retrains the field on the teacher's own
**coupled** endpoint pairs (x0, x1 = ODE(x0)): with the pairing fixed, the
optimal field is the straight line between them, so the retrained
"2-rectified" flow integrates accurately in a handful of Euler steps (one
round is usually enough; rounds compose).

The retrained model needs NO new sampler: it is sampled with the ordinary
Euler integrator at a small ``INTEGRATOR_STEPS`` — every existing surface
(generate-samples/metrics/serve/export) works unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdmod_tpu.models.flow_matching.fm import (
    euler_sample,
    linear_interpolant,
)

__all__ = ["generate_coupling", "reflow_loss"]


def generate_coupling(
    u_fn,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    *,
    steps: int = 100,
    time_max_pos: int = 1000,
):
    """One coupled pair batch: draw x0 ~ N(0, I), integrate the teacher ODE
    to x1, return ``(x0, x1)`` — the supervision a reflow round trains on.

    ``steps`` is the *teacher* integration accuracy (it bounds the quality
    ceiling the student can reach); the student's own step count at
    sampling time is independent and small.
    """
    k0, _ = jax.random.split(key)
    x0 = jax.random.normal(k0, sample_shape, dtype=jnp.float32)
    x1 = euler_sample(
        u_fn, past, key, sample_shape,
        steps=steps, time_max_pos=time_max_pos, x_init=x0,
    )
    return x0, jax.lax.stop_gradient(x1)


def reflow_loss(
    u_fn,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    past: jnp.ndarray | None,
    key: jax.Array,
    *,
    time_max_pos: int = 1000,
) -> jnp.ndarray:
    """Flow-matching MSE on a *given* coupled pair (always the Linear
    interpolant: the straight path between the coupled endpoints is exactly
    what rectification optimizes toward)."""
    b = x1.shape[0]
    t = jax.random.uniform(key, (b,))
    t_b = t.reshape((b,) + (1,) * (x1.ndim - 1))
    xt, u_target = linear_interpolant(x0, x1, t_b)
    u_pred = u_fn(xt, jnp.floor(t * time_max_pos), past)
    return jnp.mean(jnp.square(u_target - u_pred))
