"""End-to-end slice: train a tiny DDPM-UNet on synthetic walkers, sample,
check losses fall and samplers produce sane output (SURVEY.md §4c/§4d)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.core.schedule import ddim_tau_schedule, linear_schedule
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.models.backbones import UNet3D
from crowdmod_tpu.models.diffusion import ddim_sample, ddpm_loss, ddpm_sample
from crowdmod_tpu.models.flow_matching import euler_sample, fm_loss, heun_sample
from crowdmod_tpu.train.optim import adam_with_plateau
from crowdmod_tpu.train.state import TrainState, make_train_step

H, W, P, F, C = 8, 12, 5, 3, 3


@pytest.fixture(scope="module")
def tiny_setup():
    model = UNet3D(
        out_channels=C, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    data = jnp.asarray(synthetic_walkers(16, H, W, P + F))
    past, future = data[:, :P], data[:, P:]
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((16,)), past)
    return model, params, past, future


def test_ddpm_training_reduces_loss(tiny_setup):
    model, params, past, future = tiny_setup
    sched = linear_schedule(100, scale=0.5)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        denoise = lambda x, t, cond: model.apply(p, x, t, cond)
        return ddpm_loss(denoise, sched, future_b, past_b, key)

    state = TrainState.create(params, adam_with_plateau(2e-3, (0.9, 0.999)))
    step = make_train_step(loss_fn, donate=False)
    key = jax.random.PRNGKey(42)
    losses = []
    # 30 steps: the fixed-seed curve reaches ratio ~0.64 by step 30
    # (measured), comfortably under the 0.8 bar; 60 steps doubled the
    # module's wall-clock for no extra signal.
    for i in range(30):
        key, sub = jax.random.split(key)
        state, loss = step(state, (past, future), sub)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("guidance", ["None", "Sparsity", "mass_preservation"])
def test_ddpm_sampler_shapes_and_guidance(tiny_setup, guidance):
    model, params, past, _ = tiny_setup
    sched = linear_schedule(20, scale=0.5)
    denoise = lambda x, t, cond: model.apply(params, x, t, cond)
    sample = jax.jit(
        functools.partial(
            ddpm_sample, denoise, sched,
            guidance=guidance, lambda_guidance=0.004,
        ),
        static_argnames=("sample_shape",),
    )
    out = sample(past, jax.random.PRNGKey(0), sample_shape=(16, F, H, W, C))
    assert out.shape == (16, F, H, W, C)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ddim_sampler(tiny_setup):
    model, params, past, _ = tiny_setup
    sched = linear_schedule(20, scale=0.5)
    denoise = lambda x, t, cond: model.apply(params, x, t, cond)
    taus = ddim_tau_schedule(20, 2)
    out = ddim_sample(
        denoise, sched, past, jax.random.PRNGKey(0), (16, F, H, W, C), taus
    )
    assert out.shape == (16, F, H, W, C)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ddpm_history_trajectory(tiny_setup):
    model, params, past, _ = tiny_setup
    sched = linear_schedule(5, scale=0.5)
    denoise = lambda x, t, cond: model.apply(params, x, t, cond)
    out, traj = ddpm_sample(
        denoise, sched, past[:2], jax.random.PRNGKey(0), (2, F, H, W, C),
        history=True,
    )
    # T+1 entries: initial x_T noise first (reference xnoisy_over_time).
    assert traj.shape == (6, 2, F, H, W, C)
    np.testing.assert_allclose(traj[-1], out)
    assert not np.allclose(traj[0], traj[-1])


def test_fm_loss_and_integrators(tiny_setup):
    model, params, past, future = tiny_setup
    u_fn = lambda x, t, cond: model.apply(params, x, t, cond)
    for w_type in ["Linear", "Conic"]:
        loss = fm_loss(
            u_fn, future, past, jax.random.PRNGKey(0), w_type=w_type
        )
        assert np.isfinite(float(loss))
    e = euler_sample(u_fn, past, jax.random.PRNGKey(1), (16, F, H, W, C), steps=8)
    h = heun_sample(u_fn, past, jax.random.PRNGKey(1), (16, F, H, W, C), steps=4)
    assert e.shape == h.shape == (16, F, H, W, C)
    assert bool(jnp.all(jnp.isfinite(e))) and bool(jnp.all(jnp.isfinite(h)))


def test_ddim_analytic_oracle_and_reference_lag():
    """Pin the samplers against a closed-form eps oracle (point-mass data).

    For data concentrated at a point c, the exact noise predictor is
    ``eps*(x, t) = (x - sqrt_ab[t]·c) / somab[t]``.  A textbook DDIM recovers
    c exactly for ANY tau subset under this oracle; the reference's
    recurrence (ddpm.py:252-266) queries the model at the *next* tau while x
    still sits at the *previous* tau's noise level, so its error grows with
    the divider.  This test documents that deliberately-preserved quirk with
    numbers: near-exact at divider 1, visibly wrong at divider 100.  (The
    round-3 checkpoint study showed the quirk is quality-neutral on a
    trained model — lag-free DDIM scored the same — see VALIDATION.md.)
    """
    sched = linear_schedule(1000)
    c = jnp.full((1, 4, 4, 1), 0.7)

    def eps_oracle(x, t, past):
        sab = sched.sqrt_alpha_bar[t][:, None, None, None]
        somab = sched.sqrt_one_minus_alpha_bar[t][:, None, None, None]
        return (x - sab * c) / somab

    key = jax.random.PRNGKey(0)
    errs = {}
    for div in (1, 100):
        taus = ddim_tau_schedule(1000, div)
        out = ddim_sample(
            eps_oracle, sched, None, key, (1, 4, 4, 1), taus
        )
        errs[div] = float(jnp.abs(out - c).max())
    # Divider 1: the one-step lag is negligible — the chain converges.
    assert errs[1] < 0.05, errs
    # Divider 100: the 100-step coefficient lag dominates (measured ~3.75
    # on this oracle) — the quirk is real and preserved, not a typo here.
    assert errs[100] > 10 * errs[1], errs

    anc = ddpm_sample(eps_oracle, sched, None, key, (1, 4, 4, 1))
    assert float(jnp.abs(anc - c).max()) < 0.05
