"""DPM-Solver++(2M) tests: exactness under an oracle denoiser, shapes,
Trainer integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdmod_tpu.core.schedule import linear_schedule
from crowdmod_tpu.models.diffusion import dpm_solver_sample
from crowdmod_tpu.models.diffusion.dpm_solver import dpm_timesteps


def test_dpm_timesteps_ladder():
    ts = np.asarray(dpm_timesteps(1000, 10))
    assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 11
    assert (np.diff(ts) < 0).all()


@pytest.mark.parametrize("steps", [5, 10, 20])
def test_oracle_denoiser_recovers_x0(steps):
    """With an oracle epsilon (true x0 known), the data prediction is
    constant, so the 2M solver's exponential integrator is exact: the sample
    must land on alpha_0·x0 ≈ x0."""
    sched = linear_schedule(1000, scale=0.5)
    shape = (2, 3, 4, 6, 3)
    x0_true = jax.random.uniform(jax.random.PRNGKey(0), shape) * 2.0 - 1.0

    alpha = sched.sqrt_alpha_bar
    sigma = sched.sqrt_one_minus_alpha_bar

    def oracle_eps(x, t_vec, cond):
        t = t_vec[0]
        return (x - alpha[t] * x0_true) / sigma[t]

    out = dpm_solver_sample(
        oracle_eps, sched, None, jax.random.PRNGKey(1), shape, steps=steps
    )
    # alpha_bar[0] = 1 - beta_0 ≈ 0.99995 → alpha_0·x0 ≈ x0; residual noise
    # scales with sigma_0 ≈ 0.007.
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=0.05)


def test_dpm_close_to_ddpm_mean_for_linear_model():
    """For a linear denoiser eps = c·x the reverse ODE is linear; DPM-Solver
    with many steps and the 1000-step ancestral chain must produce outputs
    of similar scale (same marginal up to sampler noise)."""
    from crowdmod_tpu.models.diffusion import ddpm_sample

    sched = linear_schedule(200, scale=0.5)
    shape = (4, 2, 4, 4, 3)
    denoise = lambda x, t, c: 0.3 * x
    a = dpm_solver_sample(denoise, sched, None, jax.random.PRNGKey(0), shape,
                          steps=50)
    b = ddpm_sample(denoise, sched, None, jax.random.PRNGKey(0), shape)
    # Deterministic ODE vs stochastic chain: compare distributional scale.
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()
    ra = float(jnp.std(a))
    rb = float(jnp.std(b))
    assert 0.5 < ra / rb < 2.0


def test_trainer_dpm_sampler_path(smoke_cfg, tmp_path):
    from tests.test_trainer import tiny_cfg, walker_ds
    from crowdmod_tpu.train.trainer import Trainer

    cfg = tiny_cfg(smoke_cfg, tmp_path).updated(
        {"MODEL": {"DDPM": {"SAMPLER": "DPM-Solver", "DPM_STEPS": 5}}}
    )
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    past, _ = ds.gather(np.arange(2))
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 8, 12, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_dpm_rejects_guided_config(smoke_cfg, tmp_path):
    """Round-5 guard: DPM-Solver implements no guidance, so a guided config
    must error instead of silently sampling unguided under a guided label
    (the Distilled-sampler rule)."""
    from tests.test_trainer import tiny_cfg
    from crowdmod_tpu.train.trainer import Trainer

    cfg = tiny_cfg(smoke_cfg, tmp_path).updated(
        {"MODEL": {"DDPM": {"SAMPLER": "DPM-Solver", "DPM_STEPS": 5,
                            "GUIDANCE": "Sparsity",
                            "LAMBDA_GUIDANCE": 0.1}}}
    )
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    past = jnp.zeros((2, 5, 8, 12, 3))
    with pytest.raises(ValueError, match="DPM-Solver.*guidance"):
        tr.sample(past, jax.random.PRNGKey(0))


def test_dpm_steps_exceeding_timesteps_rejected():
    """steps ≥ TIMESTEPS would repeat a rounded timestep → h = 0 → NaNs;
    the sampler must refuse up front."""
    sched = linear_schedule(10)
    with pytest.raises(ValueError, match="DPM_STEPS"):
        dpm_solver_sample(
            lambda x, t, c: x, sched, None, jax.random.PRNGKey(0),
            (2, 3, 4, 4, 3), steps=10,
        )


def test_dpm_history_layout_matches_sibling_samplers():
    """history=True returns steps+1 entries with the initial noise first —
    the same contract ddpm_sample/ddim_sample document."""
    sched = linear_schedule(50)
    denoise = lambda x, t, c: jnp.zeros_like(x)
    shape = (2, 3, 4, 6, 3)
    key = jax.random.PRNGKey(0)
    steps = 7
    x, traj = dpm_solver_sample(
        denoise, sched, None, key, shape, steps=steps, history=True
    )
    assert traj.shape == (steps + 1,) + shape
    # Entry 0 is the pure initial noise; the final entry is the returned x.
    k_init = key
    noise = jax.random.normal(k_init, shape, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(traj[0]), np.asarray(noise))
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(x))


def test_ddim_unknown_guidance_rejected():
    from crowdmod_tpu.models.diffusion import ddim_sample

    sched = linear_schedule(20)
    denoise = lambda x, t, c: jnp.zeros_like(x)
    with pytest.raises(ValueError, match="unknown guidance"):
        ddim_sample(
            denoise, sched, None, jax.random.PRNGKey(0), (2, 3, 4, 6, 3),
            taus=jnp.arange(0, 19, 2), guidance="sparsity",
        )
