"""Classifier-free guidance: condition dropout, the batched cond/uncond
denoiser wrapper, sampler compatibility, and config validation
(beyond-reference capability; models/guidance.py).

Trainer-level integration (training with dropout, guided sampling, the
Distilled-sampler rejection) lives in test_trainer.py's slow tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.models.guidance import cfg_denoise_fn, drop_condition


# ---------------------------------------------------------------------------
# drop_condition
# ---------------------------------------------------------------------------

def test_drop_condition_zero_prob_is_identity():
    past = jnp.arange(24.0).reshape(2, 3, 4)
    out = drop_condition(past, jax.random.PRNGKey(0), 0.0)
    assert out is past


def test_drop_condition_rejects_bad_prob():
    past = jnp.zeros((2, 3))
    for prob in (-0.1, 1.0, 1.5):
        with pytest.raises(ValueError):
            drop_condition(past, jax.random.PRNGKey(0), prob)


def test_drop_condition_zeroes_whole_rows():
    """Dropout is per-example: a batch row is either fully zeroed (the null
    condition) or untouched — never partially masked."""
    b = 512
    past = jnp.ones((b, 5, 4, 4, 3))
    out = np.asarray(drop_condition(past, jax.random.PRNGKey(1), 0.5))
    row_means = out.reshape(b, -1).mean(axis=1)
    assert set(np.unique(row_means)) == {0.0, 1.0}
    frac = float((row_means == 0.0).mean())
    assert 0.35 < frac < 0.65  # ~Binomial(512, 0.5)


def test_drop_condition_is_jittable():
    past = jnp.ones((8, 2, 2, 2, 3))
    fn = jax.jit(lambda p, k: drop_condition(p, k, 0.5))
    out = fn(past, jax.random.PRNGKey(2))
    assert out.shape == past.shape


# ---------------------------------------------------------------------------
# cfg_denoise_fn
# ---------------------------------------------------------------------------

def _linear_denoiser(x, t, past):
    """Condition-sensitive fake denoiser with a per-example time term;
    reduces past over its own time dim like a real conditioned backbone."""
    tt = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return 0.5 * x + 2.0 * past.mean(axis=1, keepdims=True) + 0.01 * tt


def test_scale_one_returns_fn_unchanged():
    assert cfg_denoise_fn(_linear_denoiser, 1.0) is _linear_denoiser


@pytest.mark.parametrize("scale", [0.0, 0.5, 2.0, 7.5])
def test_cfg_extrapolation_identity(scale):
    """guided = f(x,t,0) + scale * (f(x,t,past) - f(x,t,0)) exactly."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 3, 4, 4, 3))
    past = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    t = jnp.arange(4)

    guided = cfg_denoise_fn(_linear_denoiser, scale)(x, t, past)
    eps_c = _linear_denoiser(x, t, past)
    eps_u = _linear_denoiser(x, t, jnp.zeros_like(past))
    np.testing.assert_allclose(
        np.asarray(guided), np.asarray(eps_u + scale * (eps_c - eps_u)),
        rtol=1e-6, atol=1e-6,
    )


def test_cfg_scale_zero_is_unconditional():
    x = jnp.ones((2, 2, 4, 4, 3))
    past = 3.0 * jnp.ones_like(x)
    t = jnp.zeros((2,), jnp.int32)
    out = cfg_denoise_fn(_linear_denoiser, 0.0)(x, t, past)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_linear_denoiser(x, t, jnp.zeros_like(past))),
        rtol=1e-6,
    )


def test_cfg_requires_condition():
    fn = cfg_denoise_fn(_linear_denoiser, 2.0)
    with pytest.raises(ValueError, match="past=None"):
        fn(jnp.zeros((2, 2, 4, 4, 3)), jnp.zeros((2,)), None)


def test_cfg_inside_ddpm_sampler():
    """The wrapped fn keeps the DenoiseFn contract: the whole guided reverse
    chain compiles as one scan and produces finite output."""
    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.diffusion import ddpm_sample

    sched = linear_schedule(5, scale=0.5)
    past = jnp.ones((2, 5, 4, 4, 3))
    shape = (2, 3, 4, 4, 3)
    out = ddpm_sample(
        cfg_denoise_fn(_linear_denoiser, 2.0), sched, past,
        jax.random.PRNGKey(4), shape,
    )
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())
    # Guidance changes the chain: scale 2 differs from pure conditional.
    base = ddpm_sample(
        _linear_denoiser, sched, past, jax.random.PRNGKey(4), shape,
    )
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_cfg_inside_fm_euler():
    from crowdmod_tpu.models.flow_matching import euler_sample

    past = jnp.ones((2, 5, 4, 4, 3))
    shape = (2, 3, 4, 4, 3)
    out = euler_sample(
        cfg_denoise_fn(_linear_denoiser, 1.5), past, jax.random.PRNGKey(5),
        shape, steps=4, time_max_pos=10,
    )
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# config validation
# ---------------------------------------------------------------------------

def test_validate_flags_bad_cfg_drop_prob(atc_cfg):
    from crowdmod_tpu.config.validate import validate_config

    bad = atc_cfg.updated({"MODEL": {"DDPM": {"CFG_DROP_PROB": 1.0}}})
    problems = validate_config(bad, "DDPM-UNet")
    assert any("CFG_DROP_PROB" in p for p in problems)

    ok = atc_cfg.updated({"MODEL": {"FM": {"CFG_DROP_PROB": 0.2,
                                           "CFG_SCALE": 3.0}}})
    assert validate_config(ok, "FM-UNet") == []


def test_validate_flags_scale_without_drop(atc_cfg):
    """CFG_SCALE != 1 with CFG_DROP_PROB == 0 means guiding against an
    unconditional branch the model never trained — must be flagged."""
    from crowdmod_tpu.config.validate import validate_config

    for node in ("DDPM", "FM"):
        bad = atc_cfg.updated({"MODEL": {node: {"CFG_SCALE": 2.0,
                                                "CFG_DROP_PROB": 0.0}}})
        problems = validate_config(bad)
        assert any("CFG_SCALE" in p for p in problems), node
    # Scale 1.0 (guidance off) with zero drop is the default and fine.
    assert validate_config(atc_cfg) == []


def test_reflow_rejects_cfg_scale(atc_cfg):
    """reflow() must refuse a config that will CFG-sample the rectified
    field: rectification stales the unconditional branch (distiller.py)."""
    from crowdmod_tpu.train.distiller import reflow

    class FakeDS:
        def __len__(self):
            return 64

    class FakeTrainer:
        family = "FM"
        arch = "FM-UNet"
        state = object()  # "restored"
        cfg = atc_cfg.updated(
            {"MODEL": {"FM": {"CFG_SCALE": 2.0, "CFG_DROP_PROB": 0.1}}}
        )

    with pytest.raises(ValueError, match="CFG_SCALE"):
        reflow(FakeTrainer(), FakeDS())
