"""ReFlow (rectified flow) for the FM family: coupling generation, loss
fixed point, the driver end-to-end, and the few-step payoff on walkers
(models/flow_matching/reflow.py, train/distiller.py::reflow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.models.backbones import UNet3D
from crowdmod_tpu.models.flow_matching import (
    euler_sample,
    fm_loss,
    generate_coupling,
    reflow_loss,
)
from crowdmod_tpu.train.optim import adam_with_plateau
from crowdmod_tpu.train.state import TrainState, make_train_step

H, W, P, F, C = 8, 12, 5, 3, 3
TMP = 100  # TIME_MAX_POS for the tiny fixtures


def test_coupling_endpoints_are_paired():
    """x1 must be the teacher ODE integrated FROM the returned x0 (not an
    independent draw)."""
    def u_fn(x, t, past):
        return 0.5 * jnp.ones_like(x)  # constant field: x1 = x0 + 0.5

    key = jax.random.PRNGKey(0)
    shape = (4, F, H, W, C)
    x0, x1 = generate_coupling(u_fn, None, key, shape, steps=20,
                               time_max_pos=TMP)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0) + 0.5, atol=1e-5
    )
    # And matches euler_sample seeded with the same x_init.
    direct = euler_sample(u_fn, None, key, shape, steps=20,
                          time_max_pos=TMP, x_init=x0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(direct), atol=0)


def test_reflow_loss_zero_for_straight_field():
    """A field that is already straight (u constant along each trajectory)
    has zero reflow loss on its own couplings — rectification's fixed
    point."""
    c = jax.random.normal(jax.random.PRNGKey(1), (F, H, W, C))

    def u_fn(x, t, past):
        return jnp.broadcast_to(c, x.shape)

    shape = (8, F, H, W, C)
    x0, x1 = generate_coupling(u_fn, None, jax.random.PRNGKey(2), shape,
                               steps=10, time_max_pos=TMP)
    loss = reflow_loss(u_fn, x0, x1, None, jax.random.PRNGKey(3),
                       time_max_pos=TMP)
    assert float(loss) < 1e-10


def _train_walker_fm_teacher(steps: int):
    """Tiny FM-UNet trained ``steps`` steps with the ordinary FM loss."""
    model = UNet3D(
        out_channels=C, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    data = jnp.asarray(synthetic_walkers(32, H, W, P + F))
    past, future = data[:, :P], data[:, P:]
    params = model.init(jax.random.PRNGKey(0), future[:1],
                        jnp.zeros((1,)), past[:1])

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return fm_loss(
            lambda x, t, c_: model.apply(p, x, t, c_),
            future_b, past_b, key, time_max_pos=TMP,
        )

    state = TrainState.create(params, adam_with_plateau(2e-3, (0.9, 0.999)))
    step = make_train_step(loss_fn, donate=False)
    key = jax.random.PRNGKey(42)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, _ = step(state, (past, future), sub)
    return model, state.params, past, future


@pytest.fixture(scope="module")
def walker_fm_teacher():
    """Well-trained teacher for the statistical quality study (nightly)."""
    return _train_walker_fm_teacher(150)


@pytest.fixture(scope="module")
def walker_fm_teacher_smoke():
    """Cheap teacher for mechanics-only tests (driver/checkpoint path):
    10 steps keeps the oracle tier fast; quality claims live nightly."""
    return _train_walker_fm_teacher(10)


@pytest.mark.slow
@pytest.mark.nightly
def test_reflow_straightens_the_transport_map(walker_fm_teacher):
    """The defining ReFlow property, testable at any teacher quality: after
    rectification, FEW Euler steps reproduce the teacher's MANY-step
    transport of the same noise far better than the teacher itself can in
    few steps.  (Quality-vs-ground-truth is a hardware-validation claim —
    VALIDATION.md — because it needs a well-trained teacher whose
    trajectories are meaningfully curved; this fixture's is not.)"""
    model, teacher_params, past, future = walker_fm_teacher

    # Couple over the training pasts with an accurate teacher integration.
    gen = jax.jit(lambda prm, p_, k: generate_coupling(
        lambda x, t, c_: model.apply(prm, x, t, c_),
        p_, k, future.shape, steps=50, time_max_pos=TMP,
    ))
    x0, x1 = gen(teacher_params, past, jax.random.PRNGKey(5))

    def loss_fn(prm, batch, k):
        p_, x0_b, x1_b = batch
        return reflow_loss(
            lambda x, t, c_: model.apply(prm, x, t, c_),
            x0_b, x1_b, p_, k, time_max_pos=TMP,
        )

    state = TrainState.create(
        jax.tree.map(jnp.copy, teacher_params),
        adam_with_plateau(1e-3, (0.9, 0.999)),
    )
    step = make_train_step(loss_fn, donate=False)
    key = jax.random.PRNGKey(6)
    losses = []
    for _ in range(200):
        key, sub = jax.random.split(key)
        state, loss = step(state, (past, x0, x1), sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.7, (
        "reflow training did not reduce the straight-path loss"
    )

    # Held-out noise: the target transport is the teacher's accurate
    # 50-step map of the SAME x0; compare 4-step integrations against it.
    x0_test = jax.random.normal(jax.random.PRNGKey(11), future.shape)

    def integrate(prm, steps):
        return euler_sample(
            lambda x, t, c_: model.apply(prm, x, t, c_),
            past, jax.random.PRNGKey(0), future.shape,
            steps=steps, time_max_pos=TMP, x_init=x0_test,
        )

    target = integrate(teacher_params, 50)
    t_err = float(jnp.mean(jnp.square(integrate(teacher_params, 4) - target)))
    s_err = float(jnp.mean(jnp.square(integrate(state.params, 4) - target)))
    assert np.isfinite(s_err)
    assert s_err < t_err, (
        f"4-step rectified transport error ({s_err:.5f}) should beat the "
        f"teacher's own 4-step error ({t_err:.5f}) against its 50-step map"
    )


@pytest.mark.slow
def test_reflow_driver_and_checkpoint(walker_fm_teacher_smoke, tmp_path):
    """Trainer-level driver: restore an FM teacher, reflow, save the RF
    tag, reload into a fresh Trainer, and sample with few Euler steps."""
    import os

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.windows import WindowDataset
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.distiller import reflow, reflow_tag
    from crowdmod_tpu.train.trainer import Trainer

    model, teacher_params, past, future = walker_fm_teacher_smoke

    cfg = load_config("ATC.yml").updated({
        "DATA_FS": {"SAVE_DIR": str(tmp_path / "ckpts"),
                    "OUTPUT_DIR": str(tmp_path / "out")},
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "DATASET": {"BATCH_SIZE": 8, "RAW_SEQ_LEN": P + F},
        "MODEL": {"FM": {
            "TIME_MAX_POS": TMP,
            "INTEGRATOR": "Euler",
            "INTEGRATOR_STEPS": {"EULER": 4, "HEUN": 2},
            "UNET": {"BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                     "APPLY_ATTENTION": [False, False],
                     "DROPOUT_RATE": 0.0},
        }},
    })
    trainer = Trainer(cfg, "FM-UNet", seed=0)
    trainer.setup()
    trainer.state = trainer.state.replace(params=teacher_params)

    data = jnp.concatenate([past, future], axis=1)
    ds = WindowDataset(data, P, F, stride=8)

    hist = reflow(
        trainer, ds, rounds=1, coupling_steps=20, epochs_per_round=2,
        lr=1e-3, save_dir=str(tmp_path / "ckpts"), seed=0,
    )
    assert hist["rounds"] == [1]
    assert all(np.isfinite(v) for vs in hist["loss"].values() for v in vs)

    path = os.path.join(
        str(tmp_path / "ckpts"),
        ckpt.checkpoint_name(cfg, "FM-UNet", reflow_tag(1)),
    )
    assert os.path.exists(path)
    meta = ckpt.read_metadata(path)
    assert meta["reflow_round"] == 1

    fresh = Trainer(cfg, "FM-UNet", seed=0)
    fresh.load(path)
    out = fresh.sample(past[:4], jax.random.PRNGKey(0))  # 4-step Euler
    assert out.shape == (4, F, H, W, C)
    assert bool(jnp.isfinite(out).all())


def test_reflow_validates_inputs():
    from crowdmod_tpu.train.distiller import reflow

    class FakeTrainer:
        family = "DDPM"
        arch = "DDPM-UNet"

    with pytest.raises(ValueError, match="FM family"):
        reflow(FakeTrainer(), None)
