"""Tests for the textbook eta-DDIM sampler and v/x0 parameterizations.

The round-3 protocol study (VALIDATION.md) showed every *deterministic*
few-step sampler collapsing (~7 PSNR vs ancestral 22.3) because ODE samplers
integrate the eps-model's bias coherently.  ``ddim_eta_sample`` is the
stochastic fix (eta=1 = respaced-ancestral posterior; Song et al. Eq. 12 with
current-level coefficients — unlike the reference recurrence at
/root/reference/models/diffusion/ddpm.py:252-266 which lags coefficients by
one tau), and PRED_TYPE v/x0 (Salimans & Ho 2022) is the training-side fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.core.schedule import (
    linear_schedule,
    q_sample,
    respaced_taus,
)
from crowdmod_tpu.models.diffusion import (
    as_eps_fn,
    ddim_eta_sample,
    ddpm_loss,
    prediction_target,
)

SHAPE = (8, 3, 4, 6, 3)  # (B, F, H, W, C)


def _point_mass_eps(c):
    """Exact eps predictor for point-mass data x0 = c."""
    sched = linear_schedule(1000)

    def eps_fn(x, t, _past):
        sab = sched.sqrt_alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        somab = sched.sqrt_one_minus_alpha_bar[t].reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        return (x - sab * c) / somab

    return sched, eps_fn


@pytest.mark.parametrize("eta", [0.0, 0.5, 1.0])
@pytest.mark.parametrize("steps", [1, 5, 50])
def test_point_mass_oracle_exact(eta, steps):
    """With the exact score of point-mass data, eta-DDIM recovers the point
    exactly at ANY step count and ANY eta (pred_x0 is exact each step and the
    final transition lands on it)."""
    c = 0.37
    sched, eps_fn = _point_mass_eps(c)
    taus = respaced_taus(sched.timesteps, steps)
    out = jax.jit(
        lambda k: ddim_eta_sample(
            eps_fn, sched, None, k, SHAPE, taus, eta=eta
        )
    )(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), c, atol=1e-4)


def _gaussian_eps(mu, s):
    """Exact eps predictor for x0 ~ N(mu, s^2 I): the marginal x_t is
    N(sab*mu, sab^2 s^2 + 1 - abar), eps* = -somab * score."""
    sched = linear_schedule(1000)

    def eps_fn(x, t, _past):
        sab = sched.sqrt_alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        somab = sched.sqrt_one_minus_alpha_bar[t].reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        var = sab**2 * s**2 + somab**2
        return somab * (x - sab * mu) / var

    return sched, eps_fn


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_gaussian_oracle_distribution(eta):
    """With the exact Gaussian score, both the deterministic (eta=0) flow and
    the stochastic (eta=1) respaced-ancestral chain must transport N(0, I)
    toward N(mu, s^2), with the O(1/steps) discretization bias in the
    variance SHRINKING as the grid refines (measured on TPU: std 0.44 -> 0.49
    from 20 -> 100 steps against true 0.5)."""
    mu, s = 0.8, 0.5
    sched, eps_fn = _gaussian_eps(mu, s)
    shape = (1024, 2, 2, 1, 1)

    def run(steps):
        taus = respaced_taus(sched.timesteps, steps)
        out = jax.jit(
            lambda k: ddim_eta_sample(
                eps_fn, sched, None, k, shape, taus, eta=eta
            )
        )(jax.random.PRNGKey(1))
        return np.asarray(out).ravel()

    coarse, fine = run(20), run(100)
    assert abs(fine.mean() - mu) < 0.03, fine.mean()
    assert abs(fine.std() - s) < 0.06, fine.std()
    # Variance bias must shrink with grid refinement.
    assert abs(fine.std() - s) < abs(coarse.std() - s)


def test_eta1_variance_is_respaced_posterior():
    """eta=1 sigma^2 must equal the respaced-subchain ancestral posterior
    variance beta_tilde = (1-abar_prev)/(1-abar_t) * (1-abar_t/abar_prev)."""
    sched = linear_schedule(1000)
    taus = respaced_taus(1000, 50)
    ab = np.asarray(sched.alpha_bar)
    t, tp = int(taus[10]), int(taus[9])
    sigma_sq = (1 - ab[tp]) / (1 - ab[t]) * (1 - ab[t] / ab[tp])
    # Respaced beta for the subchain built from abar ratios:
    beta_tilde = (1 - ab[tp]) / (1 - ab[t]) * (1 - ab[t] / ab[tp])
    assert np.isclose(sigma_sq, beta_tilde)
    assert 0 < sigma_sq < 1


def test_respaced_taus_endpoints_and_bounds():
    taus = respaced_taus(1000, 50)
    assert int(taus[0]) == 0 and int(taus[-1]) == 999
    assert taus.shape[0] == 50
    assert np.all(np.diff(np.asarray(taus)) > 0)
    assert respaced_taus(1000, 1).tolist() == [999]
    with pytest.raises(ValueError):
        respaced_taus(1000, 0)
    with pytest.raises(ValueError):
        respaced_taus(10, 11)


def test_ddim_eta_guidance_modes():
    """Round 5 (VERDICT r4 item 7): mass-preservation guidance now composes
    with the respaced eta-DDIM chain (beyond the reference's Sparsity-only
    DDIM, ddpm.py:267-271); unknown modes still raise."""
    sched = linear_schedule(10)
    key = jax.random.PRNGKey(0)
    base = ddim_eta_sample(
        lambda x, t, c: 0.1 * x, sched, None, key, SHAPE,
        respaced_taus(10, 4),
    )
    guided = ddim_eta_sample(
        lambda x, t, c: 0.1 * x, sched, None, key, SHAPE,
        respaced_taus(10, 4), guidance="mass_preservation",
    )
    assert bool(jnp.isfinite(guided).all())
    assert not np.allclose(np.asarray(base), np.asarray(guided))
    with pytest.raises(ValueError):
        ddim_eta_sample(
            lambda x, t, c: x, sched, None, key,
            SHAPE, respaced_taus(10, 4), guidance="Bogus",
        )


# ---------------------------------------------------------------------------
# PRED_TYPE parameterizations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pred_type", ["eps", "v", "x0"])
def test_pred_type_roundtrip_identity(pred_type):
    """A model that outputs exactly the pred_type target must convert back to
    the exact eps through as_eps_fn at every timestep."""
    sched = linear_schedule(1000)
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, SHAPE)
    t = jax.random.randint(k2, (SHAPE[0],), 0, 1000)
    noisy, eps = q_sample(sched, x0, t, k3)
    target = prediction_target(sched, pred_type, x0, eps, t)

    model = lambda x, tv, c: target  # "perfect" pred_type head
    eps_back = as_eps_fn(model, sched, pred_type)(noisy, t, None)
    np.testing.assert_allclose(
        np.asarray(eps_back), np.asarray(eps), atol=2e-4
    )


def test_pred_type_v_loss_zero_for_perfect_model():
    """ddpm_loss(pred_type=v) is zero when the model emits the exact v."""
    sched = linear_schedule(100)
    future = jax.random.normal(jax.random.PRNGKey(3), SHAPE)

    def perfect_v(x, t, _c):
        # Invert: given (x, t) and known x0=future, v = sab*eps - somab*x0
        # with eps = (x - sab*x0)/somab.
        sab = sched.sqrt_alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        somab = sched.sqrt_one_minus_alpha_bar[t].reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        eps = (x - sab * future) / somab
        return sab * eps - somab * future

    loss = ddpm_loss(
        perfect_v, sched, future, None, jax.random.PRNGKey(4), pred_type="v"
    )
    assert float(loss) < 1e-6


def test_pred_type_unknown_raises():
    sched = linear_schedule(10)
    with pytest.raises(ValueError):
        as_eps_fn(lambda x, t, c: x, sched, "score")
    with pytest.raises(ValueError):
        prediction_target(
            sched, "score", jnp.zeros(SHAPE), jnp.zeros(SHAPE),
            jnp.zeros((SHAPE[0],), jnp.int32),
        )


def test_trainer_dispatch_ddim_eta_and_v(tmp_path):
    """Trainer end-to-end with SAMPLER=DDIM-eta and PRED_TYPE=v: one epoch
    fits and sampling produces the right shape with finite values."""
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.windows import WindowDataset
    from crowdmod_tpu.train.trainer import Trainer

    cfg = load_config("ATC.yml").updated({
        "DATA_FS": {
            "SAVE_DIR": str(tmp_path / "ckpt"),
            "OUTPUT_DIR": str(tmp_path / "out"),
        },
        "DATASET": {"BATCH_SIZE": 4},
        "MACROPROPS": {"ROWS": 8, "COLS": 12},
        "MODEL": {"DDPM": {
            "TIMESTEPS": 20, "SAMPLER": "DDIM-eta", "ETA": 1.0,
            "ETA_STEPS": 5, "PRED_TYPE": "v",
            "DIT": {"TRAIN": {"EPOCHS": 1, "EMA_DECAY": 0.99}},
        }},
    })
    rng = np.random.default_rng(0)
    data = rng.standard_normal((8, 8, 8, 12, 3)).astype(np.float32)
    ds = WindowDataset(
        jnp.asarray(data), past_len=cfg.DATASET.PAST_LEN,
        future_len=cfg.DATASET.FUTURE_LEN, stride=cfg.MACROPROPS.STRIDE,
    )
    tr = Trainer(cfg, "DDPM-DiT", run_dir=str(tmp_path / "run"))
    hist = tr.fit(ds, epochs=1, scan_epoch=False)
    assert np.isfinite(hist["train_loss"][0])
    past = jnp.asarray(data[:2, :5])
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 8, 12, 3)
    assert np.isfinite(np.asarray(out)).all()
