"""Progressive distillation: grid math, target algebra, loss, sampler, and
the phase driver end-to-end on the walker fixture (beyond-reference
capability; models/diffusion/distill.py, train/distiller.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.core.schedule import linear_schedule
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.models.backbones import UNet3D
from crowdmod_tpu.models.diffusion import ddpm_loss
from crowdmod_tpu.models.diffusion.distill import (
    ddim_det_step,
    distill_grid,
    distill_loss,
    distill_targets,
    distilled_sample,
)
from crowdmod_tpu.train.optim import adam_with_plateau
from crowdmod_tpu.train.state import TrainState, make_train_step

H, W, P, F, C = 8, 12, 5, 3, 3


# ---------------------------------------------------------------------------
# Grid math
# ---------------------------------------------------------------------------

def test_distill_grid_endpoints_and_nesting():
    for t_total, n in [(1000, 8), (1000, 64), (100, 4), (25, 5)]:
        g = distill_grid(t_total, n)
        assert g.shape == (n + 1,)
        assert int(g[0]) == -1 and int(g[-1]) == t_total - 1
        assert np.all(np.diff(np.asarray(g)) > 0), "grid must be strict"
        # Every other point of the doubled (teacher) grid is this grid.
        g2 = distill_grid(t_total, 2 * n)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g2[::2]))


def test_distill_grid_rejects_bad_sizes():
    with pytest.raises(ValueError):
        distill_grid(1000, 0)
    with pytest.raises(ValueError):
        distill_grid(10, 11)


# ---------------------------------------------------------------------------
# DDIM-step / target algebra
# ---------------------------------------------------------------------------

def test_ddim_det_step_to_clean_recovers_x0():
    """Jumping to t=-1 with the true eps reconstructs x0 exactly."""
    sched = linear_schedule(100, scale=0.5)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, F, H, W, C))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array(73)
    x_t = sched.sqrt_alpha_bar[t] * x0 + sched.sqrt_one_minus_alpha_bar[t] * eps
    out = ddim_det_step(sched, x_t, eps, t, jnp.array(-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_distill_target_reproduces_teacher_two_step():
    """The defining identity: one deterministic student step from x_t with
    eps_target lands exactly on the teacher's two-step output x_lo."""
    sched = linear_schedule(100, scale=0.5)
    key = jax.random.PRNGKey(1)

    # An arbitrary nonlinear "teacher" (no learned weights needed: the
    # identity is algebraic, holding for ANY teacher function).
    def teacher_fn(x, t, past):
        return jnp.tanh(x) * 0.7 + 0.1 * jnp.roll(x, 1, axis=-1)

    x_t = jax.random.normal(key, (4, F, H, W, C))
    g = distill_grid(100, 10)
    t_hi, t_mid, t_lo = g[6], g[5], g[4]
    x0_tgt, eps_tgt, x_lo = distill_targets(
        teacher_fn, sched, x_t, t_hi, t_mid, t_lo, None
    )
    # Single student step using the solved target.
    x_student = ddim_det_step(sched, x_t, eps_tgt, t_hi, t_lo)
    np.testing.assert_allclose(
        np.asarray(x_student), np.asarray(x_lo), atol=1e-5
    )
    # And the (x0, eps) pair is consistent with x_t at t_hi.
    recon = (sched.sqrt_alpha_bar[t_hi] * x0_tgt
             + sched.sqrt_one_minus_alpha_bar[t_hi] * eps_tgt)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x_t), atol=1e-5)


def test_distill_target_identity_at_clean_boundary():
    """Same identity on the final step (t_lo = -1, the clean-data jump)."""
    sched = linear_schedule(100, scale=0.5)
    x_t = jax.random.normal(jax.random.PRNGKey(2), (2, F, H, W, C))

    def teacher_fn(x, t, past):
        return 0.5 * x

    g = distill_grid(100, 4)
    x0_tgt, eps_tgt, x_lo = distill_targets(
        teacher_fn, sched, x_t, g[1], distill_grid(100, 8)[1], g[0], None
    )
    x_student = ddim_det_step(sched, x_t, eps_tgt, g[1], g[0])
    np.testing.assert_allclose(
        np.asarray(x_student), np.asarray(x_lo), atol=1e-5
    )
    # t_lo = -1 means x_lo IS the implied x0.
    np.testing.assert_allclose(np.asarray(x_lo), np.asarray(x0_tgt), atol=1e-5)


def test_distill_loss_zero_for_self_consistent_teacher():
    """A teacher whose eps prediction is constant in (x, t) is already
    one-step-consistent: its two-step output equals its one-step output, so
    a student equal to the teacher has zero distillation loss."""
    sched = linear_schedule(100, scale=0.5)
    key = jax.random.PRNGKey(3)
    future = jax.random.normal(key, (8, F, H, W, C))
    const_eps = jax.random.normal(jax.random.fold_in(key, 9), (F, H, W, C))

    def fn(x, t, past):
        return jnp.broadcast_to(const_eps, x.shape)

    loss = distill_loss(fn, fn, sched, 5, future, None, jax.random.PRNGKey(4))
    assert float(loss) < 1e-8


# ---------------------------------------------------------------------------
# Sampler
# ---------------------------------------------------------------------------

def test_distilled_sample_shapes_history_and_determinism():
    sched = linear_schedule(50, scale=0.5)

    def denoise(x, t, past):
        return 0.1 * x

    shape = (4, F, H, W, C)
    key = jax.random.PRNGKey(5)
    out = jax.jit(
        lambda k: distilled_sample(denoise, sched, None, k, shape, 4)
    )(key)
    assert out.shape == shape and bool(jnp.isfinite(out).all())

    # Deterministic given the key (the only randomness is the init noise).
    out2 = distilled_sample(denoise, sched, None, key, shape, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

    final, traj = distilled_sample(
        denoise, sched, None, key, shape, 4, history=True
    )
    assert traj.shape == (5,) + shape
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))


def test_distilled_sample_eta_stochastic_on_grid():
    """eta>0 injects the grid's respaced posterior noise: finite output,
    differs from the deterministic chain, eta=0 path unchanged, and the
    last transition (t_lo = -1) stays noise-free by construction."""
    sched = linear_schedule(50, scale=0.5)

    def denoise(x, t, past):
        return 0.1 * x

    shape = (4, F, H, W, C)
    key = jax.random.PRNGKey(5)
    det = distilled_sample(denoise, sched, None, key, shape, 4)
    sto = distilled_sample(denoise, sched, None, key, shape, 4, eta=1.0)
    assert sto.shape == shape and bool(jnp.isfinite(sto).all())
    assert not np.allclose(np.asarray(det), np.asarray(sto))
    # eta passed as 0.0 compiles to the identical deterministic chain.
    det2 = distilled_sample(denoise, sched, None, key, shape, 4, eta=0.0)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det2), atol=0)

    # Single-step chain: the only transition lands on clean data (t_lo=-1),
    # so eta must have no effect there.
    one_det = distilled_sample(denoise, sched, None, key, shape, 1)
    one_sto = distilled_sample(denoise, sched, None, key, shape, 1, eta=1.0)
    np.testing.assert_allclose(
        np.asarray(one_det), np.asarray(one_sto), atol=1e-6
    )


def test_distilled_eta_sampler_spec():
    from crowdmod_tpu.utils.sampler_spec import sampler_overrides

    assert sampler_overrides("Distilled-eta:1.0:8") == {
        "SAMPLER": "Distilled", "DISTILL_ETA": 1.0, "DISTILL_STEPS": 8,
    }
    assert sampler_overrides("Distilled") == {"SAMPLER": "Distilled"}
    with pytest.raises(ValueError, match="Distilled-eta"):
        sampler_overrides("Distilled-eta:8")


def test_guidance_suffix_sampler_spec():
    from crowdmod_tpu.utils.sampler_spec import sampler_overrides

    over = sampler_overrides("DDIM-eta:1.0:25+Sparsity:0.6")
    assert over["GUIDANCE"] == "Sparsity"
    assert over["LAMBDA_GUIDANCE"] == 0.6
    # Guidance suffixes parse on Distilled specs too (dispatch rejects them
    # later); the step count must survive the suffix.
    over = sampler_overrides("Distilled-eta:1.0:8+Sparsity:0.4")
    assert over["DISTILL_STEPS"] == 8
    # mass_preservation has no lambda knob — a silent no-op sweep is worse
    # than an error.
    assert sampler_overrides("DDPM+mass_preservation") == {
        "SAMPLER": "DDPM", "GUIDANCE": "mass_preservation",
    }
    with pytest.raises(ValueError, match="no lambda"):
        sampler_overrides("DDPM+mass_preservation:0.1")
    with pytest.raises(ValueError, match="guidance suffix"):
        sampler_overrides("DDPM+Bogus:0.1")


# ---------------------------------------------------------------------------
# End-to-end: distill a trained tiny DDPM and beat the undistilled few-step
# sampler at the same step budget.
# ---------------------------------------------------------------------------

def _train_walker_teacher(steps: int):
    """Tiny UNet trained ``steps`` steps with the ordinary DDPM loss."""
    t_total = 64
    sched = linear_schedule(t_total, scale=0.5)
    model = UNet3D(
        out_channels=C, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    data = jnp.asarray(synthetic_walkers(32, H, W, P + F))
    past, future = data[:, :P], data[:, P:]
    params = model.init(jax.random.PRNGKey(0), future[:1], jnp.zeros((1,)),
                        past[:1])

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched,
            future_b, past_b, key,
        )

    state = TrainState.create(params, adam_with_plateau(2e-3, (0.9, 0.999)))
    step = make_train_step(loss_fn, donate=False)
    key = jax.random.PRNGKey(42)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, _ = step(state, (past, future), sub)
    return model, state.params, sched, past, future


@pytest.fixture(scope="module")
def walker_teacher():
    """Well-trained teacher for the statistical quality study (nightly)."""
    return _train_walker_teacher(150)


@pytest.fixture(scope="module")
def walker_teacher_smoke():
    """Cheap teacher for mechanics-only tests: the driver/checkpoint path
    doesn't care about sample quality, only that phases run, tags save,
    and reloads dispatch — 10 steps keeps the oracle tier fast."""
    return _train_walker_teacher(10)


@pytest.mark.slow
@pytest.mark.nightly
def test_progressive_distill_beats_fewstep_teacher(walker_teacher):
    """Distill 16 -> 4 steps; the 4-step student must reconstruct the
    walkers better than the teacher forced through the same 4-step grid
    (the whole point of distillation)."""
    model, teacher_params, sched, past, future = walker_teacher

    teacher_fn = lambda x, t, c: model.apply(teacher_params, x, t, c)

    n = 16
    params = teacher_params
    key = jax.random.PRNGKey(7)
    while n >= 4:
        cur_teacher = params

        def loss_fn(p, batch, k, *, _n=n, _t=cur_teacher):
            past_b, future_b = batch
            return distill_loss(
                lambda x, t, c: model.apply(p, x, t, c),
                lambda x, t, c: model.apply(_t, x, t, c),
                sched, _n, future_b, past_b, k,
            )

        state = TrainState.create(
            jax.tree.map(jnp.copy, params),
            adam_with_plateau(1e-3, (0.9, 0.999)),
        )
        step = make_train_step(loss_fn, donate=False)
        for _ in range(120):
            key, sub = jax.random.split(key)
            state, loss = step(state, (past, future), sub)
        assert bool(jnp.isfinite(loss))
        params = state.params
        n //= 2

    skey = jax.random.PRNGKey(11)
    shape = future.shape
    student_out = distilled_sample(
        lambda x, t, c: model.apply(params, x, t, c),
        sched, past, skey, shape, 4,
    )
    teacher_4step = distilled_sample(
        teacher_fn, sched, past, skey, shape, 4
    )

    def mse(a, b):
        return float(jnp.mean(jnp.square(a - b)))

    s_err, t_err = mse(student_out, future), mse(teacher_4step, future)
    assert np.isfinite(s_err)
    assert s_err < t_err, (
        f"4-step student ({s_err:.4f}) should beat the raw teacher forced "
        f"to 4 steps ({t_err:.4f})"
    )


@pytest.mark.slow
def test_progressive_distill_driver_and_distilled_sampler(
        walker_teacher_smoke, tmp_path):
    """The Trainer-level driver: restore a teacher into a Trainer, distill,
    save the D-tag checkpoint, reload it, and sample via SAMPLER=Distilled."""
    import os

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.windows import WindowDataset
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.distiller import distilled_tag, progressive_distill
    from crowdmod_tpu.train.trainer import Trainer

    model, teacher_params, sched, past, future = walker_teacher_smoke

    cfg = load_config("ATC.yml").updated({
        "DATA_FS": {"SAVE_DIR": str(tmp_path / "ckpts"),
                    "OUTPUT_DIR": str(tmp_path / "out")},
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "DATASET": {"BATCH_SIZE": 8, "RAW_SEQ_LEN": P + F},
        "MODEL": {"DDPM": {
            "TIMESTEPS": 64, "SCALE": 0.5,
            "SAMPLER": "Distilled", "DISTILL_STEPS": 4,
            "UNET": {"BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                     "APPLY_ATTENTION": [False, False],
                     "DROPOUT_RATE": 0.0},
        }},
    })
    trainer = Trainer(cfg, "DDPM-UNet", seed=0)
    trainer.setup()
    trainer.state = trainer.state.replace(params=teacher_params)

    data = jnp.concatenate([past, future], axis=1)  # (N, P+F, H, W, C)
    ds = WindowDataset(data, P, F, stride=8)

    hist = progressive_distill(
        trainer, ds, target_steps=4, start_steps=8, epochs_per_phase=2,
        lr=1e-3, save_dir=str(tmp_path / "ckpts"), seed=0,
    )
    assert hist["phases"] == [8, 4]
    assert all(np.isfinite(v) for vs in hist["loss"].values() for v in vs)

    # The saved student checkpoint reloads into a fresh Trainer and samples
    # through the ordinary sampler dispatch.
    path = os.path.join(
        str(tmp_path / "ckpts"),
        ckpt.checkpoint_name(cfg, "DDPM-UNet", distilled_tag(4)),
    )
    assert os.path.exists(path)
    fresh = Trainer(cfg, "DDPM-UNet", seed=0)
    fresh.load(path)
    meta = ckpt.read_metadata(path)
    assert meta["distilled_steps"] == 4
    out = fresh.sample(past[:4], jax.random.PRNGKey(0))
    assert out.shape == (4, F, H, W, C)
    assert bool(jnp.isfinite(out).all())


def test_distilled_sampler_rejects_guidance():
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.train.trainer import Trainer

    cfg = load_config("ATC.yml").updated({
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "MODEL": {"DDPM": {
            "TIMESTEPS": 64, "SAMPLER": "Distilled", "DISTILL_STEPS": 4,
            "GUIDANCE": "Sparsity", "LAMBDA_GUIDANCE": 0.01,
            "UNET": {"BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                     "APPLY_ATTENTION": [False, False],
                     "DROPOUT_RATE": 0.0},
        }},
    })
    trainer = Trainer(cfg, "DDPM-UNet", seed=0)
    trainer.setup()
    past = jnp.zeros((2, P, H, W, C))
    with pytest.raises(ValueError, match="guidance-free"):
        trainer.sample(past, jax.random.PRNGKey(0))


def test_distiller_validates_inputs():
    from crowdmod_tpu.train.distiller import progressive_distill

    class FakeTrainer:
        family = "FM"
        arch = "FM-UNet"

    with pytest.raises(ValueError, match="DDPM family"):
        progressive_distill(FakeTrainer(), None, target_steps=4)
