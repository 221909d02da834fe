"""Progressive distillation for few-step DDPM sampling.

Beyond-reference capability (the reference's only fast path is the DDIM
tau-subset sampler, /root/reference/models/diffusion/ddpm.py:238-282, which
trades quality for speed at small step counts).  Progressive distillation
(Salimans & Ho, ICLR 2022) instead *trains* a student to reproduce, in one
deterministic DDIM step, what its teacher produces in two — halving the
sampler's step count per phase with no inference-time quality/step trade-off
knob left behind: the distilled model natively samples in ``n_steps`` steps.

TPU-first design notes:
  * All grids are static (trace-time) arrays; the per-example timestep draw
    and the two teacher evaluations live inside one jitted loss, so a
    distillation train step costs exactly three backbone forwards + one
    backward — no host round trips.
  * The student keeps the epsilon parameterization of the backbone API, but
    the loss is computed in x0-space with truncated-SNR weighting
    ``max(SNR, 1)`` (the paper's stable choice at low step counts, where an
    epsilon-space MSE blows up as alpha_bar -> 0).
  * Grids nest exactly: ``distill_grid(T, n)`` equals every other point of
    ``distill_grid(T, 2n)``, so each phase's student is only ever queried at
    timesteps its teacher was trained on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdmod_tpu.core.schedule import DiffusionSchedule, q_sample

__all__ = [
    "distill_grid",
    "ddim_det_step",
    "distill_targets",
    "distill_loss",
    "distilled_sample",
]


def distill_grid(timesteps: int, n_steps: int) -> jnp.ndarray:
    """``(n_steps+1,)`` int32 timestep grid for an ``n_steps`` sampler.

    ``grid[0] == -1`` denotes clean data (alpha_bar == 1 by convention) and
    ``grid[n_steps] == timesteps - 1`` is the terminal noise level; student
    step ``k`` jumps ``grid[k] -> grid[k-1]``.  Spacing is uniform, so
    ``distill_grid(T, n)[k] == distill_grid(T, 2n)[2k]`` exactly — the
    nesting each distillation phase relies on.
    """
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if n_steps > timesteps:
        raise ValueError(
            f"n_steps ({n_steps}) exceeds schedule timesteps ({timesteps}); "
            "the grid would repeat timesteps"
        )
    span = float(timesteps)  # from -1 (clean) to timesteps-1 (noise)
    # k/n and (2k)/(2n) are bitwise-equal IEEE divisions, so nesting between
    # a grid and its doubled teacher grid is exact in float32.
    frac = jnp.arange(n_steps + 1, dtype=jnp.float32) / n_steps
    return jnp.round(-1.0 + span * frac).astype(jnp.int32)


def _coeffs(sched: DiffusionSchedule, t: jnp.ndarray, ndim: int):
    """``(sqrt_abar, sqrt_1m_abar)`` at ``t`` broadcast over ``ndim`` dims;
    ``t == -1`` means clean data: ``(1, 0)``."""
    tc = jnp.maximum(t, 0)
    sab = jnp.where(t >= 0, sched.sqrt_alpha_bar[tc], 1.0)
    somab = jnp.where(t >= 0, sched.sqrt_one_minus_alpha_bar[tc], 0.0)
    shape = sab.shape + (1,) * (ndim - sab.ndim)
    return sab.reshape(shape), somab.reshape(shape)


def ddim_det_step(
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    eps: jnp.ndarray,
    t_from: jnp.ndarray,
    t_to: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic (eta=0) DDIM jump ``x_{t_from} -> x_{t_to}``.

    Song et al. Eq. 12 with sigma=0: reconstruct x0 from the epsilon
    prediction at ``t_from``, re-noise analytically to ``t_to``.  ``t_to``
    may be -1 (clean data).  ``t_from``/``t_to`` may be scalars or ``(B,)``.
    """
    sab_f, somab_f = _coeffs(sched, t_from, x.ndim)
    sab_t, somab_t = _coeffs(sched, t_to, x.ndim)
    x0 = (x - somab_f * eps) / sab_f
    return sab_t * x0 + somab_t * eps


def distill_targets(
    teacher_fn,
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    t_hi: jnp.ndarray,
    t_mid: jnp.ndarray,
    t_lo: jnp.ndarray,
    past: jnp.ndarray | None,
):
    """Teacher's two deterministic DDIM half-steps, solved back into the
    single-step ``(x0_target, eps_target)`` the student must predict.

    With ``x_lo`` the teacher's two-step output, the target pair is the
    unique ``(x0, eps)`` consistent with both endpoints::

        x_t  = sab_hi * x0 + somab_hi * eps
        x_lo = sab_lo * x0 + somab_lo * eps

    so a single student DDIM step from ``x_t`` with ``eps_target`` lands
    exactly on ``x_lo``.  Returns ``(x0_target, eps_target, x_lo)``, all
    gradient-stopped.
    """
    b = x_t.shape[0]

    def tvec(t):
        return jnp.broadcast_to(t, (b,)).astype(jnp.int32)

    eps1 = teacher_fn(x_t, tvec(t_hi), past)
    x_mid = ddim_det_step(sched, x_t, eps1, t_hi, t_mid)
    eps2 = teacher_fn(x_mid, tvec(t_mid), past)
    x_lo = ddim_det_step(sched, x_mid, eps2, t_mid, t_lo)

    sab_hi, somab_hi = _coeffs(sched, t_hi, x_t.ndim)
    sab_lo, somab_lo = _coeffs(sched, t_lo, x_t.ndim)
    # Strictly nonzero: t_lo < t_hi makes somab_lo*sab_hi < somab_hi*sab_lo.
    denom = somab_lo * sab_hi - somab_hi * sab_lo
    eps_tgt = (x_lo * sab_hi - x_t * sab_lo) / denom
    x0_tgt = (x_t - somab_hi * eps_tgt) / sab_hi
    return (
        jax.lax.stop_gradient(x0_tgt),
        jax.lax.stop_gradient(eps_tgt),
        jax.lax.stop_gradient(x_lo),
    )


def distill_loss(
    student_fn,
    teacher_fn,
    sched: DiffusionSchedule,
    n_steps: int,
    future: jnp.ndarray,
    past: jnp.ndarray | None,
    key: jax.Array,
) -> jnp.ndarray:
    """One progressive-distillation loss evaluation for an ``n_steps``
    student against a ``2*n_steps`` teacher.

    Per example: draw a student step ``k ~ U{1..n}``, q-sample the data to
    ``t_hi = grid2[2k]``, run the teacher through the exactly-nested
    midpoint ``grid2[2k-1]`` down to ``grid2[2k-2]``, and regress the
    student's implied x0 onto the solved single-step target with
    truncated-SNR weighting ``w = max(alpha_bar/(1-alpha_bar), 1)``.
    """
    grid2 = distill_grid(sched.timesteps, 2 * n_steps)
    kk, kq = jax.random.split(key)
    b = future.shape[0]
    k = jax.random.randint(kk, (b,), 1, n_steps + 1)
    t_hi = grid2[2 * k]
    t_mid = grid2[2 * k - 1]
    t_lo = grid2[2 * k - 2]

    x_t, _ = q_sample(sched, future, t_hi, kq)
    x0_tgt, _, _ = distill_targets(
        teacher_fn, sched, x_t, t_hi, t_mid, t_lo, past
    )

    eps_s = student_fn(x_t, t_hi, past)
    sab, somab = _coeffs(sched, t_hi, future.ndim)
    x0_s = (x_t - somab * eps_s) / sab
    snr = jnp.square(sab / somab)
    w = jnp.maximum(snr, 1.0)
    return jnp.mean(w * jnp.square(x0_s - x0_tgt))


def distilled_sample(
    denoise_fn,
    sched: DiffusionSchedule,
    past: jnp.ndarray | None,
    key: jax.Array,
    sample_shape: tuple[int, ...],
    n_steps: int,
    *,
    eta: float = 0.0,
    history: bool = False,
) -> jnp.ndarray:
    """Few-step sampler for a distilled student: one ``lax.scan`` over the
    ``n_steps`` grid of :func:`distill_grid`.

    The chain starts from N(0, I) at ``grid[n] = T-1`` (where
    ``alpha_bar ~ 0``).  ``eta == 0`` takes the same :func:`ddim_det_step`
    the distillation targets were built from, so sampling is consistent
    with training by construction.  ``eta > 0`` injects the grid's respaced
    posterior noise per step (Song et al. Eq. 12 sigma, as in
    ``ddim_eta_sample``) using the student's grid-point eps predictions —
    the stochastic few-step serving class (VALIDATION.md round 5: per-step
    noise breaks the coherent bias integration that caps deterministic
    few-step chains at protocol scale).
    """
    grid = distill_grid(sched.timesteps, n_steps)
    k_init, k_loop = jax.random.split(key)
    x0 = jax.random.normal(k_init, sample_shape, dtype=jnp.float32)
    b = sample_shape[0]

    def body(x, k):
        t_hi = grid[k]
        t_lo = grid[k - 1]
        t_vec = jnp.full((b,), t_hi, dtype=jnp.int32)
        eps = denoise_fn(x, t_vec, past)
        if eta == 0.0:
            x = ddim_det_step(sched, x, eps, t_hi, t_lo)
        else:
            ab_hi = sched.alpha_bar[t_hi]
            ab_lo = jnp.where(
                t_lo >= 0, sched.alpha_bar[jnp.maximum(t_lo, 0)], 1.0
            )
            sigma = eta * jnp.sqrt(
                jnp.clip((1.0 - ab_lo) / (1.0 - ab_hi), 0.0)
            ) * jnp.sqrt(jnp.clip(1.0 - ab_hi / ab_lo, 0.0))
            pred_x0 = (x - jnp.sqrt(1.0 - ab_hi) * eps) / jnp.sqrt(ab_hi)
            direction = jnp.sqrt(
                jnp.clip(1.0 - ab_lo - sigma**2, 0.0)
            ) * eps
            z = jax.random.normal(
                jax.random.fold_in(k_loop, t_hi), x.shape, dtype=x.dtype
            )
            z = jnp.where(t_lo >= 0, z, jnp.zeros_like(z))
            x = jnp.sqrt(ab_lo) * pred_x0 + direction + sigma * z
        return x, (x if history else None)

    ks = jnp.arange(n_steps, 0, -1)
    x_final, traj = jax.lax.scan(body, x0, ks)
    if history:
        return x_final, jnp.concatenate([x0[None], traj], axis=0)
    return x_final
