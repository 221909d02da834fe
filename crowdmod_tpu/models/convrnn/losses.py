"""ConvRNN composite loss.

Rebuild of /root/reference/utils/loss.py:2-52 on native layout
``(B, T, H, W, C)``: KL-Poisson divergence on density (the network predicts
log-density), occupancy-masked velocity/variance MSE, and an empty-region
regularizer on velocity norm + variance.
"""

from __future__ import annotations

import jax.numpy as jnp

from crowdmod_tpu.core import layout


def kl_poisson_loss(rho_hat: jnp.ndarray, rho_gt: jnp.ndarray) -> jnp.ndarray:
    """Pointwise KL divergence between Poisson rates (reference loss.py:2-4)."""
    return rho_gt * (jnp.log(rho_gt) - jnp.log(rho_hat)) + rho_hat - rho_gt


def velocity_mse_loss(mu_hat, var_hat, mu_gt, var_gt):
    """Summed squared error on velocity mean + variance (loss.py:6-8)."""
    return jnp.square(mu_hat - mu_gt) + jnp.square(var_hat - var_gt)


def kl_gaussian_loss(mu_hat, var_hat, mu_gt, var_gt):
    """Gaussian KL variant kept for parity (loss.py:10-13)."""
    inv = 1.0 / var_hat
    return (
        0.5 * inv * jnp.square(mu_hat - mu_gt)
        + var_gt * inv
        - jnp.log(var_gt * inv)
        - 1.0
    )


def convrnn_loss(
    pred: jnp.ndarray,   # (B, F, H, W, 4) — log-space rho/sigma2 channels
    target: jnp.ndarray,  # (B, F, H, W, 4)
    eps: float = 1e-6,
):
    """Returns ``(rho_loss, vel_loss, occupied_term, empty_term)``.

    Matches ``evaluate_loss`` (loss.py:15-52): rho/var are exp'd from the
    network's log-space output and clamped to [1e-8, 20]; velocity MSE is
    averaged over occupied cells (rho_gt >= 1) while empty cells pay
    ‖v‖² + var² regularization.
    """
    clamp = lambda x: jnp.clip(x, 1e-8, 20.0)
    rho_hat = clamp(jnp.exp(pred[..., layout.RHO]))
    rho_gt = clamp(target[..., layout.RHO])
    rho_loss = jnp.mean(kl_poisson_loss(rho_hat, rho_gt))

    mu_hat = pred[..., layout.VX : layout.VY + 1]
    mu_gt = target[..., layout.VX : layout.VY + 1]
    var_hat = clamp(jnp.exp(pred[..., layout.SIGMA2]))
    var_gt = clamp(target[..., layout.SIGMA2])

    occupied = (rho_gt >= 1.0).astype(pred.dtype)  # (B, F, H, W)
    empty = 1.0 - occupied
    # Reference divides the 2-channel masked sum by the single-channel cell
    # count (loss.py:38-44) — kept for numerical parity.
    occupied_count = jnp.sum(occupied)
    empty_count = jnp.sum(empty)

    mse = velocity_mse_loss(mu_hat, var_hat[..., None], mu_gt, var_gt[..., None])
    occupied_term = jnp.sum(occupied[..., None] * mse) / (occupied_count + eps)

    vel_norm = jnp.sum(jnp.square(mu_hat), axis=-1)
    var_penalty = jnp.square(var_hat)
    empty_term = jnp.sum(empty * (vel_norm + var_penalty)) / (empty_count + eps)

    return rho_loss, occupied_term + empty_term, occupied_term, empty_term
