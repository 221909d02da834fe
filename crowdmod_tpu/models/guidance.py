"""Sampling-time guidance: sparsity, mass-preservation, classifier-free.

Rebuild of /root/reference/models/guidance.py:4-69 in the native
``(B, T, H, W, C)`` layout, plus classifier-free guidance (Ho & Salimans,
2022) — a beyond-reference capability orthogonal to the reference's two
post-step corrections: instead of nudging ``x`` after the reverse update,
CFG transforms the *denoiser* itself, extrapolating between its conditional
and unconditional predictions.  It applies identically to DDPM epsilon
models and FM velocity fields.

Divergence from the reference (by design, SURVEY.md §7): the reference
computes the mass-preservation gradient *numerically*, perturbing every one of
the C·H·W·T elements and re-evaluating the energy — O(N) full energy passes
(guidance.py:44-69).  Here the continuity-equation energy is a closed-form
differentiable function, so its exact gradient is one reverse-mode
``jax.grad`` evaluation (~2 energy passes).  A finite-difference twin is kept
for parity testing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdmod_tpu.core import layout


def sparsity_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Subgradient of the L1 norm of the density channel; zero elsewhere.

    Reference guidance.py:4-8.
    """
    grad = jnp.zeros_like(x)
    return grad.at[..., layout.RHO].set(jnp.sign(x[..., layout.RHO]))


def continuity_energy(
    x: jnp.ndarray, delta_t: float = 0.5, delta_l: float = 1.0
) -> jnp.ndarray:
    """Continuity-equation residual energy, per batch element → ``(B,)``.

    f = ∂ρ/∂t + ρ(∂vx/∂x + ∂vy/∂y) + vx ∂ρ/∂x + vy ∂ρ/∂y  (finite differences
    on interior cells), E = mean-normalized 0.5·Σ f².  Matches reference
    guidance.py:10-42 term for term; note x-diff is along rows (H) and y-diff
    along cols (W), as in the reference.
    """
    b, t, h, w, c = x.shape
    rho = x[..., layout.RHO]  # (B, T, H, W)
    vx = x[..., layout.VX]
    vy = x[..., layout.VY]

    # Interior in H/W; all but the last frame in T.
    r = rho[:, :-1, 1:-1, 1:-1]
    term1 = (1.0 / delta_t) * (rho[:, 1:, 1:-1, 1:-1] - r)
    term2 = (1.0 / delta_l) * r * (
        (vx[:, :-1, 2:, 1:-1] - vx[:, :-1, 1:-1, 1:-1])
        + (vy[:, :-1, 1:-1, 2:] - vy[:, :-1, 1:-1, 1:-1])
    )
    term3 = (1.0 / delta_l) * (rho[:, :-1, 2:, 1:-1] - r) * vx[:, :-1, 1:-1, 1:-1]
    term4 = (1.0 / delta_l) * (rho[:, :-1, 1:-1, 2:] - r) * vy[:, :-1, 1:-1, 1:-1]

    f = term1 + term2 + term3 + term4
    energy = 0.5 * jnp.sum(f * f, axis=(1, 2, 3))
    return energy / (h * w * t)


# Exact gradient of the summed batch energy — per-sample energies are
# independent, so grad of the sum equals the per-sample gradients.
mass_preservation_gradient = jax.grad(
    lambda x, delta_t=0.5, delta_l=1.0: jnp.sum(
        continuity_energy(x, delta_t, delta_l)
    )
)


def drop_condition(
    past: jnp.ndarray, key: jax.Array, prob: float
) -> jnp.ndarray:
    """Per-example condition dropout for classifier-free-guidance training.

    Each batch row's ``past`` block is zeroed with probability ``prob``
    (the null condition), so one model learns both the conditional and the
    unconditional field.  ``prob`` is trace-static; 0 returns ``past``
    unchanged.
    """
    if not 0.0 <= prob < 1.0:
        raise ValueError(f"CFG drop probability must be in [0, 1), got {prob}")
    if prob == 0.0:
        return past
    keep = jax.random.bernoulli(key, 1.0 - prob, (past.shape[0],))
    return past * keep.reshape((-1,) + (1,) * (past.ndim - 1)).astype(past.dtype)


def cfg_denoise_fn(denoise_fn, scale: float):
    """Wrap ``denoise_fn(x, t, past)`` with classifier-free guidance:

        out = f(x, t, 0) + scale * (f(x, t, past) - f(x, t, 0))

    ``scale == 1`` returns ``denoise_fn`` unchanged (pure conditional);
    ``scale == 0`` is fully unconditional; ``scale > 1`` extrapolates toward
    the condition.  The two evaluations run as ONE batched forward (batch
    doubled, single dispatch — on TPU the larger batch partly amortizes the
    extra FLOPs).  The wrapped fn keeps the ``DenoiseFn`` signature, so
    every sampler (DDPM/DDIM/DPM-Solver, FM Euler/Heun) takes it unchanged.

    The model must have been trained with condition dropout
    (:func:`drop_condition`) for the unconditional branch to be meaningful.
    """
    if scale == 1.0:
        return denoise_fn

    def guided(x, t, past):
        if past is None:
            raise ValueError(
                "cfg_denoise_fn needs a condition; got past=None "
                "(unconditioned sampling cannot be CFG-guided)"
            )
        x2 = jnp.concatenate([x, x])
        t2 = jnp.concatenate([t, t])
        past2 = jnp.concatenate([past, jnp.zeros_like(past)])
        eps_c, eps_u = jnp.split(denoise_fn(x2, t2, past2), 2)
        return eps_u + scale * (eps_c - eps_u)

    return guided


def mass_preservation_gradient_fd(
    x: jnp.ndarray, delta_t: float = 0.5, delta_l: float = 1.0, eps: float = 0.01
) -> jnp.ndarray:
    """Forward-difference gradient — the reference's numerical scheme
    (guidance.py:44-69), kept only as a test oracle for the analytic path.

    Vectorized: perturbs all N elements as one big batched energy evaluation
    instead of a Python loop over N.
    """
    b = x.shape[0]
    n = int(jnp.size(x) // b)
    base = continuity_energy(x, delta_t, delta_l)  # (B,)
    flat = x.reshape(b, n)

    def one(idx):
        pert = flat.at[:, idx].add(eps).reshape(x.shape)
        return (continuity_energy(pert, delta_t, delta_l) - base) / eps

    grads = jax.lax.map(one, jnp.arange(n))  # (N, B)
    return jnp.transpose(grads).reshape(x.shape)
