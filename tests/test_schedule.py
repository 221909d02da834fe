import jax
import jax.numpy as jnp
import numpy as np

from crowdmod_tpu.core.schedule import (
    ddim_tau_schedule,
    ddpm_reverse_step,
    linear_schedule,
    q_sample,
)


def test_linear_schedule_golden():
    """Closed-form parity with the reference buffers (forward.py:10-27)."""
    sched = linear_schedule(timesteps=1000, scale=0.5)
    beta = np.linspace(0.5e-4, 0.5 * 2e-2, 1000, dtype=np.float32)
    np.testing.assert_allclose(sched.beta, beta, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha, 1 - beta, rtol=1e-6)
    np.testing.assert_allclose(
        sched.alpha_bar, np.cumprod(1 - beta), rtol=3e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alpha_bar,
        np.sqrt(1 - np.cumprod(1 - beta)),
        rtol=3e-5,
    )
    assert sched.timesteps == 1000


def test_q_sample_reconstruction():
    """x_t is exactly sqrt(abar) x0 + sqrt(1-abar) eps for the returned eps."""
    sched = linear_schedule(100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 5, 6, 3))
    t = jnp.array([0, 10, 50, 99])
    xt, eps = q_sample(sched, x0, t, key)
    expect = (
        sched.sqrt_alpha_bar[t][:, None, None, None, None] * x0
        + sched.sqrt_one_minus_alpha_bar[t][:, None, None, None, None] * eps
    )
    np.testing.assert_allclose(xt, expect, rtol=1e-5)


def test_q_sample_statistics():
    """At large t the marginal approaches N(0, I)."""
    sched = linear_schedule(1000)
    xt, _ = q_sample(
        sched,
        jnp.full((2048, 1, 4, 4, 1), 3.0),
        jnp.full((2048,), 999),
        jax.random.PRNGKey(2),
    )
    assert abs(float(jnp.mean(xt))) < 0.1
    assert abs(float(jnp.std(xt)) - 1.0) < 0.05


def test_reverse_step_t0_deterministic():
    """At t == 0 no z-noise is added (reference ddpm.py:27)."""
    sched = linear_schedule(10)
    x = jnp.ones((2, 2, 2, 2, 3))
    eps = jnp.zeros_like(x)
    out1, sigma, alpha_t = ddpm_reverse_step(sched, eps, x, jnp.int32(0), jax.random.PRNGKey(0))
    out2, _, _ = ddpm_reverse_step(sched, eps, x, jnp.int32(0), jax.random.PRNGKey(99))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)
    np.testing.assert_allclose(out1, x * sched.one_by_sqrt_alpha[0], rtol=1e-6)
    np.testing.assert_allclose(
        float(jnp.squeeze(sigma)), float(jnp.sqrt(sched.beta[0])), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(jnp.squeeze(alpha_t)), float(1 - sched.beta[0]), rtol=1e-6
    )


def test_reverse_undoes_forward_mean():
    """With a perfect eps prediction, the reverse-step mean recovers the
    scaled x0 direction (single-step algebraic identity)."""
    sched = linear_schedule(100)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (8, 2, 4, 4, 3))
    t = jnp.full((8,), 60)
    xt, eps = q_sample(sched, x0, t, jax.random.PRNGKey(4))
    # Pass scalar t=60; key irrelevant since we check the mean term via t>0
    # by subtracting the injected noise contribution analytically.
    out, sigma, _ = ddpm_reverse_step(sched, eps, xt, jnp.int32(60), jax.random.PRNGKey(5))
    mean = sched.one_by_sqrt_alpha[60] * (
        xt - sched.beta[60] / sched.sqrt_one_minus_alpha_bar[60] * eps
    )
    # out = mean + sqrt(beta) z exactly: the residual must BE the drawn
    # z-noise (reconstructed from the key), and its spread must be
    # sigma-scaled from both sides — a dropped eps term or missing noise
    # would slip through a loose upper bound alone.
    z = jax.random.normal(jax.random.PRNGKey(5), xt.shape, dtype=xt.dtype)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mean + jnp.squeeze(sigma) * z), atol=1e-5
    )
    resid = np.asarray(out - mean)
    s = float(jnp.squeeze(sigma))
    assert 0.8 * s < np.std(resid) < 1.2 * s
    # And the mean itself recovers the scaled-x0 direction: with a perfect
    # eps, mean == sqrt(alpha_bar[t-1])-scaled x0 up to the known algebra.
    expected_mean = sched.one_by_sqrt_alpha[60] * (
        sched.sqrt_alpha_bar[60] * x0
        + (sched.sqrt_one_minus_alpha_bar[60]
           - sched.beta[60] / sched.sqrt_one_minus_alpha_bar[60]) * eps
    )
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(expected_mean), atol=1e-5
    )


def test_ddim_taus():
    taus = ddim_tau_schedule(1000, 2)
    assert taus[0] == 0 and int(taus[-1]) <= 998
    assert len(taus) == len(np.arange(0, 999, 2))
