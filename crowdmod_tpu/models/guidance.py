"""Sampling-time guidance: sparsity and mass-preservation.

Rebuild of /root/reference/models/guidance.py:4-69 in the native
``(B, T, H, W, C)`` layout.

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
