"""Trainer orchestration tests: fit/NaN-watchdog/checkpoint/metrics across
all model families, on tiny overrides of the smoke config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.data.windows import WindowDataset
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.train.checkpoint import (
    checkpoint_name, gc_checkpoints, run_tag,
)
from crowdmod_tpu.train.trainer import Trainer


def tiny_cfg(smoke_cfg, tmp_path, **model_overrides):
    over = {
        "DATA_FS": {
            "SAVE_DIR": str(tmp_path / "ckpts"),
            "OUTPUT_DIR": str(tmp_path / "out"),
        },
        "MACROPROPS": {"ROWS": 8, "COLS": 12},
        "DATASET": {"BATCH_SIZE": 8},
        "MODEL": {
            "DDPM": {
                "TIMESTEPS": 10,
                "CHECKPOINTS_TO_KEEP": 1,
                "UNET": {
                    "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                    "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
                    "TRAIN": {"EPOCHS": 2},
                },
            },
            "FM": {
                "CHECKPOINTS_TO_KEEP": 0,
                "INTEGRATOR_STEPS": {"EULER": 5, "HEUN": 3},
                "UNET": {
                    "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                    "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
                    "TRAIN": {"EPOCHS": 1},
                },
            },
            "CONVRNN": {
                "ENC_HIDDEN_CH": [8, 16, 16, 16, 16, 16],
                "FORC_HIDDEN_CH": [16, 16, 16, 16, 16, 16, 8],
                "TRAIN": {"EPOCHS": 1},
            },
            **model_overrides,
        },
    }
    return smoke_cfg.updated(over)


def walker_ds(cfg, channels=3, n=6):
    h, w = cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS
    raw = synthetic_walkers(n, h, w, 16)
    if channels == 4:
        raw = np.concatenate([raw, np.zeros(raw.shape[:-1] + (1,), raw.dtype)], -1)
    return WindowDataset(
        jnp.asarray(raw), past_len=cfg.DATASET.PAST_LEN,
        future_len=cfg.DATASET.FUTURE_LEN, stride=8,
    )


def test_ddpm_fit_checkpoint_sample(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))
    hist = tr.fit(ds, ds)
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["val_loss"][0] is not None

    # Best checkpoint "000" exists with metadata + events stream written.
    best = os.path.join(cfg.DATA_FS.SAVE_DIR,
                        checkpoint_name(cfg, "DDPM-UNet", "000"))
    assert os.path.isdir(best)
    assert os.path.exists(os.path.join(best, "metadata.json"))
    assert os.path.exists(tmp_path / "run" / "events.jsonl")

    # Save the FINAL params explicitly and round-trip them through a fresh
    # trainer (the "000" best-loss checkpoint need not equal the final
    # epoch's params).
    tr.save(cfg.DATA_FS.SAVE_DIR, 999)
    final_ckpt = os.path.join(cfg.DATA_FS.SAVE_DIR,
                              checkpoint_name(cfg, "DDPM-UNet", 999))
    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run2")).setup()
    meta = tr2.load(final_ckpt)
    assert meta["arch"] == "DDPM-UNet"
    l1, _ = jax.tree.flatten(tr.state.params)
    l2, _ = jax.tree.flatten(tr2.state.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    past, _ = ds.gather(np.arange(4))
    out = tr2.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (4, 3, 8, 12, 3)


def test_ddim_sampler_path(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    cfg = cfg.updated({"MODEL": {"DDPM": {"SAMPLER": "DDIM", "DDIM_DIVIDER": 2}}})
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    past, _ = ds.gather(np.arange(2))
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 8, 12, 3)


def test_fm_fit_and_sample(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "FM-UNet", run_dir=str(tmp_path / "runfm"))
    hist = tr.fit(ds)
    assert np.isfinite(hist["train_loss"]).all()
    past, _ = ds.gather(np.arange(2))
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 8, 12, 3)


def test_convrnn_fit_and_sample(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, channels=4)
    tr = Trainer(cfg, "ConvRNN", run_dir=str(tmp_path / "runc"))
    hist = tr.fit(ds)
    assert np.isfinite(hist["train_loss"]).all()
    past, _ = ds.gather(np.arange(2))
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 8, 12, 4)
    # exp applied to rho/sigma2 channels → strictly positive.
    assert float(out[..., 0].min()) > 0
    assert float(out[..., 3].min()) > 0


def test_generate_metrics_end_to_end(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path).updated({"DATASET": {"BATCH_SIZE": 2}})
    ds = walker_ds(cfg, n=8)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "runm")).setup()
    data = tr.generate_metrics(
        ds, metric="PSNR", chunk=2, batches_to_use=1,
        output_dir=str(tmp_path / "metrics"),
    )
    assert data["PSNR"].shape[1] == 3
    tag = run_tag(cfg, "DDPM-UNet", "000")
    assert (tmp_path / "metrics" / f"PSNR_NS4_{tag}.csv").exists()


def test_gc_checkpoints_retention(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    save = tmp_path / "ckpts"
    save.mkdir()

    def mk(tag):
        d = save / checkpoint_name(cfg, "DDPM-UNet", tag)
        d.mkdir()
        (d / "metadata.json").write_text("{}")
        return d

    best = mk("000")
    abort = mk("abort")
    epochs = {e: mk(e) for e in (3, 7, 12, 20)}
    # Foreign run (different arch) must be untouched.
    other = save / checkpoint_name(cfg, "FM-UNet", 5)
    other.mkdir()
    # Crash debris: half-committed tmp dir + orphaned sidecar.
    tmp_dir = save / (checkpoint_name(cfg, "DDPM-UNet", 9)
                      + ".orbax-checkpoint-tmp")
    tmp_dir.mkdir()
    orphan = save / (checkpoint_name(cfg, "DDPM-UNet", 11) + ".meta.json")
    orphan.write_text("{}")

    removed = gc_checkpoints(save, cfg, "DDPM-UNet",
                             keep_epochs=2, remove_abort=True)
    assert best.is_dir() and other.is_dir()
    assert not abort.exists() and not tmp_dir.exists() and not orphan.exists()
    assert not epochs[3].exists() and not epochs[7].exists()
    assert epochs[12].is_dir() and epochs[20].is_dir()
    assert len(removed) == 5  # abort, tmp, orphan, CE3, CE7

    # keep_epochs=0 wipes all numbered; 000 still survives.
    gc_checkpoints(save, cfg, "DDPM-UNet", keep_epochs=0)
    assert best.is_dir()
    assert not epochs[12].exists() and not epochs[20].exists()


def test_fit_gc_removes_stale_abort(smoke_cfg, tmp_path):
    """A completed fit() clears a previous crash's emergency checkpoint."""
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    save = tmp_path / "ckpts"
    save.mkdir()
    stale = save / checkpoint_name(cfg, "DDPM-UNet", "abort")
    stale.mkdir()
    ds = walker_ds(cfg)
    Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).fit(ds)
    assert not stale.exists()
    assert (save / checkpoint_name(cfg, "DDPM-UNet", "000")).is_dir()


def test_checkpoint_name_scheme(atc_cfg):
    assert checkpoint_name(atc_cfg, "DDPM-UNet", "000") == (
        "DDPM-UNet_ATC_TE200_PL5_FL3_CE000_NA"
    )
    assert checkpoint_name(atc_cfg, "FM-UNet", 7) == (
        "FM-UNet_ATC_TE200_PL5_FL3_CE7_Linear"
    )
    assert checkpoint_name(atc_cfg, "ConvRNN", "000") == (
        "ConvRNN_ATC_TE600_PL5_FL3_CE000_GRUCell"
    )
    assert run_tag(atc_cfg, "DDPM-UNet", "000") == "TE200_PL5_FL3_CE000_NA"


def test_scan_epoch_matches_batch_loop(smoke_cfg, tmp_path, monkeypatch):
    """A whole-epoch lax.scan must visit exactly the dataset's windows
    (shuffled, each once) and take the same number of optimizer steps as
    the per-batch loop."""
    import crowdmod_tpu.train.trainer as tmod

    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, channels=3, n=16)

    # Capture the stacked epoch batches actually fed to the scan so a
    # wrong gather (repeated batch, dropped shuffle) can't hide behind a
    # finite loss.
    captured = []
    orig = tmod.make_epoch_step

    def spy(loss_fn, **kw):
        step = orig(loss_fn, **kw)

        def wrapped(state, stacked, key):
            captured.append(jax.tree.map(np.asarray, stacked))
            return step(state, stacked, key)

        return wrapped

    monkeypatch.setattr(tmod, "make_epoch_step", spy)

    tr_loop = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "r1"))
    h_loop = tr_loop.fit(ds, epochs=2, scan_epoch=False)
    tr_scan = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "r2"))
    h_scan = tr_scan.fit(ds, epochs=2, scan_epoch=True)

    # Key-split structure differs between the two paths (one split per batch
    # vs jax.random.split(key, n)), so losses aren't bit-equal — but both
    # must train sanely on identical data.
    assert np.isfinite(h_loop["train_loss"]).all()
    assert np.isfinite(h_scan["train_loss"]).all()
    # Both visit the same number of optimizer steps.
    assert int(tr_loop.state.step) == int(tr_scan.state.step)

    # Every epoch's stacked batches tile the dataset exactly once.
    assert len(captured) == 2
    all_past, _ = ds.gather(np.arange(len(ds)))
    want = np.sort(np.asarray(all_past).reshape(len(ds), -1), axis=0)
    orders = []
    for past_stack, _ in captured:
        flat = past_stack.reshape(-1, past_stack.shape[-4] *
                                  past_stack.shape[-3] *
                                  past_stack.shape[-2] * past_stack.shape[-1])
        assert flat.shape[0] == len(ds) - len(ds) % cfg.DATASET.BATCH_SIZE \
            or flat.shape[0] == len(ds)
        got = np.sort(flat, axis=0)
        if flat.shape[0] == len(ds):
            np.testing.assert_allclose(got, want, atol=0)
        # Per-window fingerprint robust to sparse data (column 0 can be
        # all-zero in the walker fixture).
        orders.append(flat.sum(axis=1))
    # Different epochs shuffle differently (seed + epoch).
    assert not np.array_equal(orders[0], orders[1])


def test_emergency_checkpoint_on_abort(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, channels=3, n=8)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))

    class Boom(RuntimeError):
        pass

    # Sabotage the tracker so epoch 1 logging explodes mid-fit.
    from crowdmod_tpu.utils.tracker import RunTracker

    tracker = RunTracker(str(tmp_path / "run"), use_wandb=False)
    orig_log = tracker.log
    tracker.log = lambda *a, **k: (_ for _ in ()).throw(Boom("log"))
    import pytest as _pytest

    with _pytest.raises(Boom):
        tr.fit(ds, epochs=2, tracker=tracker)
    abort = os.path.join(cfg.DATA_FS.SAVE_DIR,
                         checkpoint_name(cfg, "DDPM-UNet", "abort"))
    assert os.path.isdir(abort)


def test_epoch_arrays_layout(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, channels=3, n=8)
    past_b, future_b = ds.epoch_arrays(4, shuffle=False)
    n_batches = len(ds) // 4
    assert past_b.shape == (n_batches, 4, 5, 8, 12, 3)
    assert future_b.shape == (n_batches, 4, 3, 8, 12, 3)
    # First stacked batch equals a plain gather of the first 4 windows.
    p0, f0 = ds.gather(np.arange(4))
    np.testing.assert_array_equal(np.asarray(past_b[0]), np.asarray(p0))


def test_resume_from_abort(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, channels=3, n=8)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    assert not tr.resume_from_abort()  # nothing saved yet
    tr.save(cfg.DATA_FS.SAVE_DIR, "abort")
    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run2"))
    assert tr2.resume_from_abort()
    for a, b in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_native_tsan_build(tmp_path, monkeypatch):
    """The sanitizer build path must compile (race-detection harness for the
    threaded C++ runtime)."""
    import shutil

    from crowdmod_tpu.native.build import build_library

    monkeypatch.setenv("CROWDMOD_NATIVE_SANITIZE", "thread")
    monkeypatch.setenv("CROWDMOD_NATIVE_CACHE", str(tmp_path / "san"))
    lib = build_library(force=True)
    assert lib is not None and lib.exists()


def test_async_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from crowdmod_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )

    state = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
             "step": jnp.int32(7)}
    path = save_checkpoint(
        tmp_path / "async_ck", state, {"arch": "DDPM-UNet"}, async_save=True
    )
    wait_for_saves()
    restored, meta = load_checkpoint(path, template=state)
    assert meta["arch"] == "DDPM-UNet"
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(12.0).reshape(3, 4)
    )
    assert int(restored["step"]) == 7


def test_generate_metrics_ragged_batches_fixed_shape(smoke_cfg, tmp_path):
    """Ragged final test batches must not change the sampler's compiled
    shape: full batches are dropped (reference DataLoader drop_last), and a
    smaller-than-batch dataset is upsampled to the fixed samples_per_batch
    (VERDICT round-1 item 7)."""
    cfg = tiny_cfg(smoke_cfg, tmp_path).updated({"DATASET": {"BATCH_SIZE": 2}})
    # 10 windows; samples_per_batch = 2*2 = 4 → 2 full batches + ragged 2.
    ds = walker_ds(cfg, n=5)
    assert len(ds) == 10 and len(ds) % 4 != 0
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "runr")).setup()
    shapes = []
    orig_sample = tr.sample

    def spy(past, key, **kw):
        shapes.append(past.shape)
        return orig_sample(past, key, **kw)

    tr.sample = spy
    tr.generate_metrics(ds, metric="PSNR", chunk=2, batches_to_use=99,
                        output_dir=str(tmp_path / "m1"))
    assert shapes and all(s == (4, 5, 8, 12, 3) for s in shapes), shapes
    assert len(shapes) == 2  # ragged remainder dropped

    # Tiny dataset (< one batch): the partial batch is upsampled to the
    # same fixed shape via wrap-around repeats.
    ds_small = walker_ds(cfg, n=1)  # 2 windows < 4
    shapes.clear()
    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "runr2")).setup()
    orig2 = tr2.sample
    tr2.sample = lambda past, key, **kw: (
        shapes.append(past.shape) or orig2(past, key, **kw)
    )
    tr2.generate_metrics(ds_small, metric="PSNR", chunk=2, batches_to_use=1,
                         output_dir=str(tmp_path / "m2"))
    assert shapes == [(4, 5, 8, 12, 3)], shapes


def test_evaluate_drops_ragged_remainder(smoke_cfg, tmp_path):
    """evaluate() keeps a single compiled shape: full batches only (or the
    one partial batch when the dataset is smaller than a batch)."""
    cfg = tiny_cfg(smoke_cfg, tmp_path).updated({"DATASET": {"BATCH_SIZE": 4}})
    ds = walker_ds(cfg, n=5)  # 10 windows → 2 full batches + ragged 2
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "rune")).setup()
    seen = []
    loss = tr._loss_fn()
    tr._eval_loss = lambda p, batch, k: (
        seen.append(batch[0].shape) or jnp.asarray(0.5)
    )
    val = tr.evaluate(ds)
    assert np.isfinite(val)
    assert seen and all(s[0] == 4 for s in seen) and len(seen) == 2

    seen.clear()
    val = tr.evaluate(walker_ds(cfg, n=1))  # 2 windows < batch 4
    assert seen == [(2, 5, 8, 12, 3)]


def test_ema_state_update_math():
    """TrainState EMA: ema = d_eff*ema_prev + (1-d_eff)*params_new, where
    d_eff = min(decay, (1+t)/(10+t)) is the warmup-scheduled decay."""
    import optax

    from crowdmod_tpu.train.state import TrainState, make_train_step

    params = {"w": jnp.ones((4,))}
    d = 0.75
    state = TrainState.create(params, optax.sgd(0.5), ema_decay=d)
    assert state.ema_params is not None

    step = make_train_step(
        lambda p, batch, key: jnp.sum(p["w"] * batch), donate=False
    )
    batch = jnp.full((4,), 2.0)  # grad = 2 → new w = 1 - 0.5*2 = 0
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0, atol=1e-7)
    # Step t=0: d_eff = min(0.75, 1/10) = 0.1 → ema = 0.1*1 + 0.9*0.
    np.testing.assert_allclose(
        np.asarray(state.ema_params["w"]), 0.1, atol=1e-6
    )
    # Zero grads from here on: params stay 0, ema decays toward them with
    # d_eff = min(0.75, (1+t)/(10+t)); by t=30 the schedule caps at 0.75.
    ema = 0.1
    for t in range(1, 40):
        state, _ = step(state, jnp.zeros((4,)), jax.random.PRNGKey(t))
        ema *= min(d, (1.0 + t) / (10.0 + t))
    np.testing.assert_allclose(
        np.asarray(state.ema_params["w"]), ema, rtol=1e-5
    )

    # Disabled: no EMA tree is carried.
    off = TrainState.create(params, optax.sgd(0.5))
    assert off.ema_params is None
    off, _ = step(off, batch, jax.random.PRNGKey(0))
    assert off.ema_params is None


def test_trainer_ema_fit_sample_checkpoint(smoke_cfg, tmp_path):
    """EMA_DECAY in the TRAIN node: fit diverges ema from raw params,
    sampling uses the EMA weights, and checkpoints round-trip them."""
    cfg = tiny_cfg(smoke_cfg, tmp_path, DDPM={
        "TIMESTEPS": 10, "CHECKPOINTS_TO_KEEP": 0,
        "UNET": {
            "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
            "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
            "TRAIN": {"EPOCHS": 2, "EMA_DECAY": 0.9},
        },
    })
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))
    tr.fit(ds)
    assert tr.state.ema_params is not None
    leaves = jax.tree.leaves(tr.state.params)
    ema_leaves = jax.tree.leaves(tr.state.ema_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves, ema_leaves)
    ), "EMA should lag the raw weights after training"

    past = jnp.zeros((2, cfg.DATASET.PAST_LEN, 8, 12, 3))
    out = tr.sample(past, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()

    # Round-trip via an explicit post-fit checkpoint (the "000" best may
    # capture an earlier epoch's EMA than the final state).
    tr.save(cfg.DATA_FS.SAVE_DIR, "999")
    final = os.path.join(cfg.DATA_FS.SAVE_DIR,
                         checkpoint_name(cfg, "DDPM-UNet", "999"))
    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run2"))
    tr2.setup()
    tr2.load(final)
    for a, b in zip(jax.tree.leaves(tr2.state.ema_params),
                    jax.tree.leaves(tr.state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_trainer_ema_decay_validation(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path, DDPM={
        "TIMESTEPS": 10, "CHECKPOINTS_TO_KEEP": 0,
        "UNET": {
            "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
            "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
            "TRAIN": {"EPOCHS": 1, "EMA_DECAY": 1.5},
        },
    })
    with pytest.raises(ValueError, match="EMA_DECAY"):
        Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()


def test_load_restores_full_train_state(smoke_cfg, tmp_path):
    """Crash recovery resumes step/Adam moments/LR, not just weights —
    without the step counter the EMA warmup schedule would collapse the
    accumulated average on the first post-resume update."""
    from crowdmod_tpu.train.optim import get_learning_rate

    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))
    tr.fit(ds)
    assert int(tr.state.step) > 0
    tr.save(cfg.DATA_FS.SAVE_DIR, "abort")

    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run2"))
    assert tr2.resume_from_abort()
    assert int(tr2.state.step) == int(tr.state.step)
    assert get_learning_rate(tr2.state.opt_state) == pytest.approx(
        get_learning_rate(tr.state.opt_state)
    )
    assert tr2.plateau.lr == pytest.approx(
        get_learning_rate(tr.state.opt_state)
    )
    for a, b in zip(jax.tree.leaves(tr.state.opt_state),
                    jax.tree.leaves(tr2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_nan_watchdog_aborts_without_completing(smoke_cfg, tmp_path):
    """3 consecutive NaN epochs must mark the run aborted (CLI exits
    nonzero) and must NOT run the completion-time retention sweep."""
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()

    # A pre-existing numbered checkpoint from an earlier run of the same
    # (cfg, arch): a failed run must not garbage-collect it.
    stale = os.path.join(cfg.DATA_FS.SAVE_DIR,
                         checkpoint_name(cfg, "DDPM-UNet", 7))
    os.makedirs(stale)

    real_step = tr._train_step
    tr._train_step = lambda st, batch, key: (
        real_step(st, batch, key)[0], jnp.float32(jnp.nan)
    )
    hist = tr.fit(ds, epochs=10, scan_epoch=False)
    assert hist["aborted"] is True
    assert len(hist["train_loss"]) == 3  # stopped at the watchdog, not 10
    assert os.path.isdir(stale), "failed run must not GC prior checkpoints"


def test_eval_loss_is_deterministic_mode(smoke_cfg, tmp_path):
    """evaluate() must run the model with dropout OFF (reference
    model.eval() semantics); the training closure must keep it ON."""
    cfg = tiny_cfg(
        smoke_cfg, tmp_path,
        DDPM={"TIMESTEPS": 10, "CHECKPOINTS_TO_KEEP": 0, "UNET": {
            "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
            "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.5,
            "TRAIN": {"EPOCHS": 1},
        }},
    )
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    past, future = ds.gather(np.arange(4))
    key = jax.random.PRNGKey(7)
    eval_loss = tr._loss_fn(deterministic=True)
    train_loss = tr._loss_fn()
    e1 = float(eval_loss(tr.state.params, (past, future), key))
    e2 = float(eval_loss(tr.state.params, (past, future), key))
    t1 = float(train_loss(tr.state.params, (past, future), key))
    assert e1 == e2
    # At 50% dropout the train-mode loss must differ from the eval loss.
    assert abs(t1 - e1) > 1e-9
    # evaluate() itself returns a finite deterministic value.
    v1, v2 = tr.evaluate(ds), tr.evaluate(ds)
    assert np.isfinite(v1) and v1 == v2


def test_eval_loss_skips_condition_dropout(smoke_cfg, tmp_path):
    """Condition dropout (CFG_DROP_PROB) is a training regularizer; the
    deterministic (eval) loss must not randomly un-condition rows, so at
    identical params/key it equals the loss of a drop-free config."""
    base = tiny_cfg(smoke_cfg, tmp_path)
    with_drop = base.updated({"MODEL": {"DDPM": {"CFG_DROP_PROB": 0.5}}})
    tr_a = Trainer(base, "DDPM-UNet", seed=0,
                   run_dir=str(tmp_path / "a")).setup()
    tr_b = Trainer(with_drop, "DDPM-UNet", seed=0,
                   run_dir=str(tmp_path / "b")).setup()
    ds = walker_ds(base)
    batch = ds.gather(np.arange(4))
    key = jax.random.PRNGKey(3)
    e_a = float(tr_a._loss_fn(deterministic=True)(tr_a.state.params, batch, key))
    e_b = float(tr_b._loss_fn(deterministic=True)(tr_b.state.params, batch, key))
    assert e_a == e_b
    # The *training* closure with drop > 0 must differ (rows get zeroed).
    t_b = float(tr_b._loss_fn()(tr_b.state.params, batch, key))
    assert abs(t_b - e_b) > 1e-9


def test_resume_does_not_clobber_best_checkpoint(smoke_cfg, tmp_path):
    """After resume_from_abort, a worse first epoch must not overwrite the
    pre-crash best-loss '000' checkpoint."""
    from crowdmod_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    save_dir = cfg.DATA_FS.SAVE_DIR
    # Pre-crash state: a best checkpoint with an unbeatably low loss and an
    # abort checkpoint to resume from.
    tr.save(save_dir, "000", extra={"epoch_loss": 1e-12})
    tr.save(save_dir, "abort")
    tr2 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run2"))
    assert tr2.resume_from_abort()
    tr2.fit(ds, epochs=1)
    best = os.path.join(save_dir, checkpoint_name(cfg, "DDPM-UNet", "000"))
    meta = ckpt.read_metadata(best)
    assert meta["epoch_loss"] == 1e-12, "resume overwrote the best checkpoint"
    # A FRESH run (no resume) still replaces the stale best.
    tr3 = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run3"))
    tr3.fit(ds, epochs=1)
    meta = ckpt.read_metadata(best)
    assert meta["epoch_loss"] != 1e-12


def test_late_checkpoint_epochs_distinct(smoke_cfg, tmp_path):
    """CHECKPOINTS_TO_KEEP late epochs are drawn without replacement."""
    cfg = tiny_cfg(
        smoke_cfg, tmp_path,
        DDPM={"TIMESTEPS": 10, "CHECKPOINTS_TO_KEEP": 3, "UNET": {
            "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
            "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
            "TRAIN": {"EPOCHS": 4},
        }},
    )
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))
    tr.fit(ds, epochs=4)
    tags = [d.split("_CE")[-1].split("_")[0]
            for d in os.listdir(cfg.DATA_FS.SAVE_DIR)]
    numbered = [t for t in tags if t.isdigit() and t != "000"]
    # Pool is epochs {3, 4}; keep=3 must save both, not fewer via duplicates.
    assert len(numbered) == 2


def test_async_save_keeps_previous_checkpoint_until_commit(tmp_path):
    """Replacing a checkpoint asynchronously must never leave a window with
    no committed checkpoint: the old one stays loadable until the new one
    has fully committed and swapped in (then GC of staging leftovers)."""
    from crowdmod_tpu.train.checkpoint import (
        load_checkpoint,
        read_metadata,
        save_checkpoint,
        wait_for_saves,
    )

    path = tmp_path / "best"
    v1 = {"params": {"w": jnp.zeros(4)}}
    save_checkpoint(path, v1, {"epoch_loss": 1.0})  # committed sync

    v2 = {"params": {"w": jnp.ones(4)}}
    save_checkpoint(path, v2, {"epoch_loss": 0.5}, async_save=True)
    # Old checkpoint still present and loadable while the new one commits.
    restored, meta = load_checkpoint(path, template=v1)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.zeros(4))
    wait_for_saves()
    restored, meta = load_checkpoint(path, template=v2)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.ones(4))
    assert meta["epoch_loss"] == 0.5
    assert not (tmp_path / "best.pending").exists()
    assert not (tmp_path / "best.meta.json").exists()


def test_read_metadata_tolerates_corruption(tmp_path):
    """A truncated metadata.json (hard kill mid-write) must not break
    resume; an orphaned sidecar without its directory must not count."""
    from crowdmod_tpu.train.checkpoint import read_metadata, save_checkpoint

    path = tmp_path / "ck"
    save_checkpoint(path, {"w": jnp.zeros(2)}, {"epoch_loss": 2.0})
    assert read_metadata(path)["epoch_loss"] == 2.0
    (path / "metadata.json").write_text('{"epoch_loss": 2.')  # truncated
    assert read_metadata(path) is None
    # Orphan sidecar: directory gone, sidecar left behind.
    import shutil

    shutil.rmtree(path)
    (tmp_path / "ck.meta.json").write_text('{"epoch_loss": 0.1}')
    assert read_metadata(path) is None


def test_fit_bit_deterministic_same_seed(smoke_cfg, tmp_path):
    """Two identical runs (same seed/config/data) must produce bit-identical
    parameters — production reproducibility guarantee (the reference only
    offers torch.manual_seed best-effort)."""
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    ds = walker_ds(cfg, n=8)
    tr1 = Trainer(cfg, "DDPM-UNet", seed=3, run_dir=str(tmp_path / "d1"))
    h1 = tr1.fit(ds, epochs=2)
    tr2 = Trainer(cfg, "DDPM-UNet", seed=3, run_dir=str(tmp_path / "d2"))
    h2 = tr2.fit(ds, epochs=2)
    assert h1["train_loss"] == h2["train_loss"]
    for a, b in zip(jax.tree.leaves(tr1.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And a different seed genuinely changes the run.
    tr3 = Trainer(cfg, "DDPM-UNet", seed=4, run_dir=str(tmp_path / "d3"))
    h3 = tr3.fit(ds, epochs=2)
    assert h3["train_loss"] != h1["train_loss"]


def test_cfg_training_and_guided_sampling(smoke_cfg, tmp_path):
    """Classifier-free guidance end-to-end: condition-dropout training runs
    (finite loss), CFG-scaled sampling works through Trainer.sample, and the
    guided chain differs from the pure-conditional one at the same key."""
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    cfg = cfg.updated({"MODEL": {"DDPM": {"CFG_DROP_PROB": 0.3}}})
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run"))
    hist = tr.fit(ds, ds)
    assert np.isfinite(hist["train_loss"]).all()

    past, _ = ds.gather(np.arange(2))
    base = tr.sample(past, jax.random.PRNGKey(0))

    tr.cfg = cfg.updated({"MODEL": {"DDPM": {"CFG_SCALE": 3.0}}})
    guided = tr.sample(past, jax.random.PRNGKey(0))
    assert guided.shape == base.shape
    assert np.isfinite(np.asarray(guided)).all()
    assert not np.allclose(np.asarray(guided), np.asarray(base))


def test_cfg_scale_rejected_by_distilled_sampler(smoke_cfg, tmp_path):
    cfg = tiny_cfg(smoke_cfg, tmp_path)
    cfg = cfg.updated({"MODEL": {"DDPM": {
        "SAMPLER": "Distilled", "CFG_SCALE": 2.0,
    }}})
    ds = walker_ds(cfg)
    tr = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "run")).setup()
    past, _ = ds.gather(np.arange(2))
    with pytest.raises(ValueError, match="CFG_SCALE"):
        tr.sample(past, jax.random.PRNGKey(0))
