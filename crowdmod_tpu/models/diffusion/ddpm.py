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

PRED_TYPES = ("eps", "v", "x0")


def _ab_coeffs(sched: DiffusionSchedule, t: jnp.ndarray, ndim: int):
    """``(sqrt_abar_t, sqrt_1m_abar_t)`` broadcast over ``ndim`` dims."""
    sab = sched.sqrt_alpha_bar[t]
    somab = sched.sqrt_one_minus_alpha_bar[t]
    shape = sab.shape + (1,) * (ndim - sab.ndim)
    return sab.reshape(shape), somab.reshape(shape)


def prediction_target(
    sched: DiffusionSchedule,
    pred_type: str,
    x0: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Training target for the chosen model parameterization.

    ``eps`` is the reference's choice (ddpm.py:120); ``v`` is the
    angular-velocity target v = sqrt(abar)*eps - sqrt(1-abar)*x0 of
    Salimans & Ho (progressive distillation, ICLR 2022) — it keeps the
    target bounded across the whole noise range so few-step/deterministic
    samplers do not coherently integrate the eps-head's low-SNR bias
    (the round-3 protocol-scale failure mode, VALIDATION.md); ``x0``
    predicts the clean data directly.
    """
    if pred_type == "eps":
        return eps
    sab, somab = _ab_coeffs(sched, t, x0.ndim)
    if pred_type == "v":
        return sab * eps - somab * x0
    if pred_type == "x0":
        return x0
    raise ValueError(f"unknown PRED_TYPE {pred_type!r}; expected {PRED_TYPES}")


def as_eps_fn(
    fn: DenoiseFn, sched: DiffusionSchedule, pred_type: str
) -> DenoiseFn:
    """Adapt a ``pred_type``-parameterized model to the eps-space DenoiseFn
    contract every sampler consumes.

    Identities (x_t = sab*x0 + somab*eps):  eps = sab*v + somab*x_t  and
    eps = (x_t - sab*x0_hat) / somab.  The conversion is affine in the model
    output, so CFG combination commutes with it.
    """
    if pred_type == "eps":
        return fn
    if pred_type not in PRED_TYPES:
        raise ValueError(
            f"unknown PRED_TYPE {pred_type!r}; expected {PRED_TYPES}"
        )

    def eps_fn(x, t, past):
        out = fn(x, t, past)
        sab, somab = _ab_coeffs(sched, t, x.ndim)
        if pred_type == "v":
            return sab * out + somab * x
        return (x - sab * out) / somab  # x0

    return eps_fn


def ddpm_loss(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    future: jnp.ndarray,
    past: jnp.ndarray | None,
    key: jax.Array,
    *,
    pred_type: str = "eps",
) -> jnp.ndarray:
    """Simple-DDPM MSE loss: uniform t, q-sample the future, predict the
    ``pred_type`` target (eps by default — parity with the reference train
    step, ddpm.py:111-121; "v"/"x0" are beyond-reference quality options).
    """
    kt, kq = jax.random.split(key)
    b = future.shape[0]
    t = jax.random.randint(kt, (b,), 0, sched.timesteps)
    noisy, eps = q_sample(sched, future, t, kq)
    pred = denoise_fn(noisy, t, past)
    target = prediction_target(sched, pred_type, future, eps, t)
    return jnp.mean(jnp.square(pred - target))


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


def ddim_eta_sample(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    taus: jnp.ndarray,
    *,
    eta: float = 1.0,
    guidance: str = "None",
    lambda_guidance: float = 0.0,
    history: bool = False,
) -> jnp.ndarray:
    """Textbook DDIM (Song et al. Eq. 12) with *current-level* coefficients
    and the full per-transition variance:

        sigma_i = eta * sqrt((1-abar_prev)/(1-abar_t)) * sqrt(1-abar_t/abar_prev)

    Differences from :func:`ddim_sample` (which reproduces the reference's
    recurrence, ddpm.py:238-282, including its one-tau coefficient lag and
    constant sigma): coefficients are evaluated at the tau the state actually
    sits at, the variance follows the respaced posterior, and the final
    transition lands on the clean x0 prediction.  ``eta == 1`` makes each
    update the exact ancestral posterior of the respaced
    {taus}-subchain — the stochastic few-step sampler whose per-step noise
    injection breaks the coherent integration of eps-model bias that
    collapses deterministic samplers at protocol scale (VALIDATION.md round
    3); ``eta == 0`` is the deterministic probability-flow DDIM.

    ``taus`` is an ascending int32 subset of [0, T-1]; sampling starts from
    N(0, I) at ``taus[-1]`` and the last step maps ``taus[0] -> x0``.
    """
    if guidance not in GUIDANCE_MODES and guidance is not None:
        raise ValueError(
            f"unknown guidance {guidance!r}; expected {GUIDANCE_MODES}"
        )
    k_init, k_loop = jax.random.split(key)
    x0_noise = jax.random.normal(k_init, sample_shape, dtype=jnp.float32)
    b = sample_shape[0]

    ts = taus[::-1]  # descending: taus[-1] ... taus[0]
    # Previous (lower-noise) tau per transition; -1 denotes clean data.
    t_prev = jnp.concatenate([ts[1:], jnp.array([-1], dtype=ts.dtype)])

    def body(x, pair):
        t, tp = pair
        step_key = jax.random.fold_in(k_loop, t)
        t_vec = jnp.full((b,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_vec, past)

        ab_t = sched.alpha_bar[t]
        ab_p = jnp.where(tp >= 0, sched.alpha_bar[jnp.maximum(tp, 0)], 1.0)
        sigma = eta * jnp.sqrt(
            jnp.clip((1.0 - ab_p) / (1.0 - ab_t), 0.0)
        ) * jnp.sqrt(jnp.clip(1.0 - ab_t / ab_p, 0.0))

        pred_x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        direction = jnp.sqrt(jnp.clip(1.0 - ab_p - sigma**2, 0.0)) * eps
        z = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        z = jnp.where(tp >= 0, z, jnp.zeros_like(z))
        x = jnp.sqrt(ab_p) * pred_x0 + direction + sigma * z

        if guidance == "Sparsity":
            x = x - lambda_guidance * jnp.sqrt(sched.beta[t]) * \
                sparsity_gradient(x)
        elif guidance == "mass_preservation":
            # Beyond-reference: the reference's DDIM is Sparsity-only
            # (ddpm.py:267-271).  The per-step strength analogue of the
            # ancestral (1 - alpha_t) is the respaced transition's
            # 1 - abar_t/abar_prev.
            x = x - (1.0 - ab_t / ab_p) * mass_preservation_gradient(
                x, 1.0, 1.0
            )
        return x, (x if history else None)

    x_final, traj = jax.lax.scan(body, x0_noise, (ts, t_prev))
    if history:
        return x_final, jnp.concatenate([x0_noise[None], traj], axis=0)
    return x_final
