"""Numerical parity against the reference PyTorch implementation.

These tests import modules from the mounted reference repo (read-only, used
ONLY as a runtime oracle — no code is copied) and check that our schedules,
forward process, reverse update, and losses reproduce the reference's
numbers on identical inputs.  Skipped when the reference isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def ref_forward():
    from models.diffusion.forward import ForwardSampler

    return ForwardSampler(timesteps=100, scale=0.5)


def test_schedule_buffers_match(ref_forward):
    from crowdmod_tpu.core.schedule import linear_schedule

    sched = linear_schedule(100, scale=0.5)
    np.testing.assert_allclose(
        np.asarray(sched.beta), ref_forward.beta.numpy(), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sched.alpha_bar), ref_forward.alpha_bar.numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alpha_bar),
        ref_forward.sqrt_alpha_bar.numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sched.one_by_sqrt_alpha),
        ref_forward.one_by_sqrt_alpha.numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alpha_bar),
        ref_forward.sqrt_one_minus_alpha_bar.numpy(), atol=1e-6,
    )


def test_q_sample_matches_reference(ref_forward):
    """Same x0 / t / eps ⇒ same x_t.  The reference draws eps inside forward
    (forward.py:29-37); we inject the identical noise through both paths."""
    from crowdmod_tpu.core.schedule import linear_schedule

    sched = linear_schedule(100, scale=0.5)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 3, 8, 12, 5)).astype(np.float32)  # ref layout
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([3, 50, 77, 99])

    # Reference: x_t = sqrt_ab[t]*x0 + sqrt_1mab[t]*eps.
    tt = torch.tensor(t)
    from models.diffusion.forward import get_from_idx

    mean = get_from_idx(ref_forward.sqrt_alpha_bar, tt) * torch.tensor(x0)
    std = get_from_idx(ref_forward.sqrt_one_minus_alpha_bar, tt)
    ref_xt = (mean + std * torch.tensor(eps)).numpy()

    # Ours (pure function, explicit eps by construction).
    mean_j = sched.sqrt_alpha_bar[t].reshape(-1, 1, 1, 1, 1) * x0
    std_j = sched.sqrt_one_minus_alpha_bar[t].reshape(-1, 1, 1, 1, 1)
    ours = np.asarray(mean_j + std_j * eps)
    np.testing.assert_allclose(ours, ref_xt, atol=1e-6)


def test_reverse_step_matches_reference():
    """DDPM.step (ddpm.py:23-38) vs ddpm_reverse_step on identical
    (x, eps_hat, z, t).  The reference DDPM class only adds the step formula
    on top of ForwardSampler's buffers (and its module drags in wandb), so
    the oracle uses the buffers + the published formula directly."""
    from models.diffusion.forward import ForwardSampler

    from crowdmod_tpu.core.schedule import ddpm_reverse_step, linear_schedule

    ref = ForwardSampler(timesteps=100, scale=0.5)
    sched = linear_schedule(100, scale=0.5)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 8, 12, 3)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    z = rng.normal(size=x.shape).astype(np.float32)

    for t in (99, 42, 7, 1):
        # Reference update with injected z: replicate its formula exactly
        # through its own registered buffers.
        bt = ref.beta[t]
        ref_x = (
            ref.one_by_sqrt_alpha[t]
            * (torch.tensor(x) - bt / ref.sqrt_one_minus_alpha_bar[t]
               * torch.tensor(eps))
            + torch.sqrt(bt) * torch.tensor(z)
        ).numpy()

        # Ours with the same z (patch the normal draw via a custom key is
        # awkward; instead call the formula path directly).
        beta_t = sched.beta[t]
        ours = np.asarray(
            sched.one_by_sqrt_alpha[t]
            * (x - beta_t / sched.sqrt_one_minus_alpha_bar[t] * eps)
            + jnp.sqrt(beta_t) * z
        )
        np.testing.assert_allclose(ours, ref_x, atol=1e-5)
        # And the function under test agrees with the formula: reconstruct
        # its own z draw to check the full x_prev, not just the scalars.
        key = jax.random.PRNGKey(0)
        out, sigma, alpha_t = ddpm_reverse_step(
            sched, jnp.asarray(eps), jnp.asarray(x), jnp.int32(t), key,
        )
        z_fn = np.asarray(jax.random.normal(key, x.shape, dtype=jnp.float32))
        if t == 0:
            z_fn = np.zeros_like(z_fn)
        mean = np.asarray(
            sched.one_by_sqrt_alpha[t]
            * (x - beta_t / sched.sqrt_one_minus_alpha_bar[t] * eps)
        )
        np.testing.assert_allclose(
            np.asarray(out), mean + np.sqrt(float(bt)) * z_fn, atol=1e-5
        )
        np.testing.assert_allclose(float(jnp.ravel(sigma)[0]), float(np.sqrt(bt)), atol=1e-6)
        np.testing.assert_allclose(float(jnp.ravel(alpha_t)[0]), float(1.0 - bt), atol=1e-6)


def test_convrnn_losses_match_reference():
    from utils.loss import divKLGaussianLoss, divKLPoissonLoss, mseLoss

    from crowdmod_tpu.models.convrnn.losses import (
        kl_gaussian_loss,
        kl_poisson_loss,
        velocity_mse_loss,
    )

    rng = np.random.default_rng(2)
    rho_hat = rng.uniform(0.1, 3.0, (4, 8, 12)).astype(np.float32)
    rho_gt = rng.uniform(0.1, 3.0, (4, 8, 12)).astype(np.float32)
    mu_hat = rng.normal(size=(4, 8, 12)).astype(np.float32)
    mu_gt = rng.normal(size=(4, 8, 12)).astype(np.float32)
    var_hat = rng.uniform(0.1, 2.0, (4, 8, 12)).astype(np.float32)
    var_gt = rng.uniform(0.1, 2.0, (4, 8, 12)).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(kl_poisson_loss(jnp.asarray(rho_hat), jnp.asarray(rho_gt))),
        divKLPoissonLoss(torch.tensor(rho_hat), torch.tensor(rho_gt)).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(velocity_mse_loss(
            jnp.asarray(mu_hat), jnp.asarray(var_hat),
            jnp.asarray(mu_gt), jnp.asarray(var_gt),
        )),
        mseLoss(torch.tensor(mu_hat), torch.tensor(var_hat),
                torch.tensor(mu_gt), torch.tensor(var_gt)).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(kl_gaussian_loss(
            jnp.asarray(mu_hat), jnp.asarray(var_hat),
            jnp.asarray(mu_gt), jnp.asarray(var_gt),
        )),
        divKLGaussianLoss(torch.tensor(mu_hat), torch.tensor(var_hat),
                          torch.tensor(mu_gt), torch.tensor(var_gt)).numpy(),
        atol=1e-5,
    )
