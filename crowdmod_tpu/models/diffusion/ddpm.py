"""DDPM training loss and jitted reverse samplers.

The reference runs its reverse process as a Python loop of T sequential
denoiser calls (/root/reference/models/diffusion/ddpm.py:206-282) — the hot
path identified in SURVEY.md §3.2.  Here the whole sampler is a single
``lax.scan`` over timesteps with the denoiser inlined in the body, so the
1000-step chain compiles to one on-device loop: no per-step dispatch, no
host↔device traffic, and guidance is a *static* branch chosen at trace time
(``cfg.MODEL.DDPM.GUIDANCE`` → specialized compilation, no runtime switch).

``denoise_fn`` is any callable ``(x, t_vec, past) -> eps_hat`` operating on
native-layout ``(B, F, H, W, C)`` arrays — typically a partial of
``model.apply`` with bound params so the same sampler serves UNet and DiT.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from crowdmod_tpu.core.schedule import (
    DiffusionSchedule,
    ddpm_reverse_step,
    q_sample,
)
from crowdmod_tpu.models.guidance import (
    mass_preservation_gradient,
    sparsity_gradient,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray | None], jnp.ndarray]

GUIDANCE_MODES = ("None", "Sparsity", "mass_preservation")


def ddpm_loss(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    future: jnp.ndarray,
    past: jnp.ndarray | None,
    key: jax.Array,
) -> jnp.ndarray:
    """Simple-DDPM MSE loss: uniform t, q-sample the future, predict eps.

    Parity with the reference train step (ddpm.py:111-121).
    """
    kt, kq = jax.random.split(key)
    b = future.shape[0]
    t = jax.random.randint(kt, (b,), 0, sched.timesteps)
    noisy, eps = q_sample(sched, future, t, kq)
    eps_pred = denoise_fn(noisy, t, past)
    return jnp.mean(jnp.square(eps_pred - eps))


def _apply_guidance(
    x: jnp.ndarray,
    guidance: str,
    *,
    sigma: jnp.ndarray,
    alpha_t: jnp.ndarray,
    lambda_guidance: float,
) -> jnp.ndarray:
    """Static guidance branch (reference ddpm.py:223-229 call sites)."""
    if guidance == "Sparsity":
        return x - lambda_guidance * sigma * sparsity_gradient(x)
    if guidance == "mass_preservation":
        # Reference call site uses delta_t=1.0, delta_l=1.0 (ddpm.py:228);
        # gradient here is the exact jax.grad of the same energy.
        grad = mass_preservation_gradient(x, 1.0, 1.0)
        return x - (1.0 - alpha_t) * grad
    if guidance == "None" or guidance is None:
        return x
    raise ValueError(f"unknown guidance {guidance!r}; expected {GUIDANCE_MODES}")


def ddpm_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    *,
    guidance: str = "None",
    lambda_guidance: float = 0.0,
    history: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Ancestral DDPM sampling as one ``lax.scan`` over reversed timesteps.

    Args:
      sample_shape: ``(B, F, H, W, C)`` of the future block to generate.
      history: when True additionally returns the ``(T+1, B, F, H, W, C)``
        trajectory — the initial x_T noise followed by each denoised state,
        matching the reference's ``xnoisy_over_time`` layout (ddpm.py:212).
    """
    k_init, k_loop = jax.random.split(key)
    x0 = jax.random.normal(k_init, sample_shape, dtype=jnp.float32)
    b = sample_shape[0]
    # The elementwise ancestral update (+ sparsity guidance) fuses into one
    # Pallas VMEM pass; mass-preservation needs jax.grad so it stays on the
    # composite path.
    fused = guidance in ("None", None, "Sparsity")

    def body(x, t):
        step_key = jax.random.fold_in(k_loop, t)
        t_vec = jnp.full((b,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_vec, past)
        if fused:
            from crowdmod_tpu.ops.pallas import fused_ancestral_update

            z = jax.random.normal(step_key, x.shape, dtype=x.dtype)
            z = jnp.where(t > 0, z, jnp.zeros_like(z))
            beta_t = sched.beta[t]
            x = fused_ancestral_update(
                x, eps, z,
                inv_sqrt_alpha=sched.one_by_sqrt_alpha[t],
                beta_over_somab=beta_t / sched.sqrt_one_minus_alpha_bar[t],
                sigma=jnp.sqrt(beta_t),
                lambda_guidance=lambda_guidance,
                sparsity=(guidance == "Sparsity"),
            )
        else:
            x, sigma, alpha_t = ddpm_reverse_step(sched, eps, x, t, step_key)
            x = _apply_guidance(
                x, guidance, sigma=sigma, alpha_t=alpha_t,
                lambda_guidance=lambda_guidance,
            )
        return x, (x if history else None)

    ts = jnp.arange(sched.timesteps - 1, -1, -1)
    x_final, traj = jax.lax.scan(body, x0, ts, unroll=unroll)
    if history:
        # Seed with the initial noise so the trajectory has T+1 entries like
        # the reference's xnoisy_over_time (ddpm.py:212).
        return x_final, jnp.concatenate([x0[None], traj], axis=0)
    return x_final


def ddim_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    taus: jnp.ndarray,
    *,
    sigma: float = 0.001,
    guidance: str = "None",
    lambda_guidance: float = 0.0,
    history: bool = False,
) -> jnp.ndarray:
    """DDIM sampling (Song et al. Eq. 12) over a tau subset, as one scan.

    Reproduces the reference's exact recurrence (ddpm.py:238-282): the
    "current" coefficients start at t = T-1 and each iteration consumes the
    previous iteration's tau coefficients, with a constant sigma noise term.
    Only sparsity guidance participates, matching the reference (ddpm.py:267).
    """
    if guidance == "mass_preservation":
        raise ValueError(
            "the DDIM path supports Sparsity/None guidance only "
            "(reference ddpm.py:267 applies no mass guidance in DDIM)"
        )
    if guidance not in ("None", "Sparsity"):
        # Same contract as the DDPM path's _apply_guidance: an unknown
        # string must raise, not silently sample unguided.
        raise ValueError(
            f"unknown guidance {guidance!r}; expected ('None', 'Sparsity')"
        )
    k_init, k_loop = jax.random.split(key)
    x0 = jax.random.normal(k_init, sample_shape, dtype=jnp.float32)
    b = sample_shape[0]

    last_t = sched.timesteps - 1
    carry0 = (
        x0,
        sched.beta[last_t],
        sched.sqrt_alpha_bar[last_t],
        sched.sqrt_one_minus_alpha_bar[last_t],
    )

    def body(carry, t):
        x, beta_c, sab_c, somab_c = carry
        step_key = jax.random.fold_in(k_loop, t)
        t_vec = jnp.full((b,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_vec, past)

        beta_p = sched.beta[t]
        sab_p = sched.sqrt_alpha_bar[t]
        somab_p = sched.sqrt_one_minus_alpha_bar[t]

        pred_x0 = (x - somab_c * eps) / sab_c
        direction = jnp.sqrt(1.0 - sab_p**2 - sigma**2) * eps
        noise = sigma * jax.random.normal(step_key, x.shape, dtype=x.dtype)
        x = sab_p * pred_x0 + direction + noise

        if guidance == "Sparsity":
            x = x - lambda_guidance * jnp.sqrt(beta_c) * sparsity_gradient(x)

        return (x, beta_p, sab_p, somab_p), (x if history else None)

    (x_final, _, _, _), traj = jax.lax.scan(body, carry0, taus[::-1])
    if history:
        # len(taus)+1 entries: initial noise first, as in the reference's
        # xnoisy_over_time (ddpm.py:249).
        return x_final, jnp.concatenate([x0[None], traj], axis=0)
    return x_final
