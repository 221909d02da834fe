"""Serialized sampler artifacts (export_artifact.py): roundtrip fidelity,
sidecar metadata, and the CLI surface (beyond-reference deployment
capability)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.config import load_config
from crowdmod_tpu.export_artifact import (
    export_sampler,
    load_sampler,
    sampler_fn,
)
from crowdmod_tpu.train.trainer import Trainer

H, W, P, F, C = 8, 12, 5, 3, 3


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = load_config("ATC.yml").updated({
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "DATASET": {"BATCH_SIZE": 4},
        "MODEL": {"DDPM": {
            "TIMESTEPS": 10, "SCALE": 0.5, "SAMPLER": "DDIM",
            "DDIM_DIVIDER": 2,
            "UNET": {"BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                     "APPLY_ATTENTION": [False, False],
                     "DROPOUT_RATE": 0.0},
        }},
    })
    trainer = Trainer(cfg, "DDPM-UNet", seed=0)
    trainer.setup()
    return trainer


def test_export_roundtrip_matches_direct_sampler(tiny_trainer, tmp_path):
    path = str(tmp_path / "sampler.stablehlo")
    meta = export_sampler(tiny_trainer, path, batch_size=4)
    assert os.path.exists(path) and os.path.exists(path + ".json")
    assert meta["past_shape"] == [4, P, H, W, C]
    assert meta["future_shape"] == [4, F, H, W, C]
    assert meta["bytes"] > 0

    restored, meta2 = load_sampler(path)
    assert meta2["arch"] == "DDPM-UNet"

    past = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, P, H, W, C)), jnp.float32
    )
    seed = jnp.uint32(7)
    direct = sampler_fn(tiny_trainer)(past, seed)
    via_artifact = restored(past, seed)
    assert via_artifact.shape == (4, F, H, W, C)
    np.testing.assert_allclose(
        np.asarray(via_artifact), np.asarray(direct), atol=1e-5
    )
    # Different seed ⇒ different sample (the seed is live, not baked).
    other = restored(past, jnp.uint32(8))
    assert float(jnp.abs(other - via_artifact).max()) > 1e-4


def test_artifact_runs_without_model_code(tiny_trainer, tmp_path):
    """The deserialized program must run in a fresh process that imports
    ONLY the loader — no model classes, no config, no checkpoint."""
    path = str(tmp_path / "sampler.stablehlo")
    export_sampler(tiny_trainer, path, batch_size=2)

    past = np.zeros((2, P, H, W, C), np.float32)
    np.save(tmp_path / "past.npy", past)
    expect = np.asarray(sampler_fn(tiny_trainer)(jnp.asarray(past),
                                                 jnp.uint32(3)))
    np.save(tmp_path / "expect.npy", expect)

    script = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from crowdmod_tpu.export_artifact import load_sampler
fn, meta = load_sampler({path!r})
past = np.load({str(tmp_path / "past.npy")!r})
out = np.asarray(fn(past, np.uint32(3)))
np.testing.assert_allclose(out, np.load({str(tmp_path / "expect.npy")!r}),
                           atol=1e-5)
print("SUBPROCESS_OK", meta["batch_size"])
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SUBPROCESS_OK 2" in out.stdout


def test_export_cli(tiny_trainer, tmp_path):
    from crowdmod_tpu.export_artifact import run
    from crowdmod_tpu.train import checkpoint as ckpt

    cfg = tiny_trainer.cfg.updated({
        "DATA_FS": {"SAVE_DIR": str(tmp_path / "ckpts"),
                    "OUTPUT_DIR": str(tmp_path / "out")},
    })
    cfg_path = tmp_path / "cfg.yml"
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    # Save a checkpoint under the expected name, then export through the CLI.
    saver = Trainer(cfg, "DDPM-UNet", seed=0)
    saver.setup()
    saver.save(str(tmp_path / "ckpts"), "000")
    ckpt.wait_for_saves()

    artifact = str(tmp_path / "exported.stablehlo")
    rc = run([
        "--config-yml-file", str(cfg_path), "--arch", "DDPM-UNet",
        "--batch", "2", "--output", artifact,
    ])
    assert rc == 0
    meta = json.load(open(artifact + ".json"))
    assert meta["batch_size"] == 2
    fn, _ = load_sampler(artifact)
    out = fn(np.zeros((2, P, H, W, C), np.float32), 0)
    assert out.shape == (2, F, H, W, C)
    assert bool(jnp.isfinite(out).all())


def test_artifact_predictor_buckets_and_serving_app(tiny_trainer, tmp_path):
    """ArtifactPredictor: bucket padding, stats, key determinism, and the
    full ServingApp/handle_predict path — all without touching the trainer
    after export."""
    from crowdmod_tpu.export_artifact import ArtifactPredictor

    p2 = str(tmp_path / "s.b2.stablehlo")
    p4 = str(tmp_path / "s.b4.stablehlo")
    export_sampler(tiny_trainer, p2, batch_size=2)
    export_sampler(tiny_trainer, p4, batch_size=4)

    pred = ArtifactPredictor([p4, p2]).warmup()
    assert pred.batch_buckets == (2, 4)
    assert pred._shape == (P, F, H, W, C)

    past3 = np.random.default_rng(1).normal(size=(3, P, H, W, C)).astype(
        np.float32
    )
    out = pred.predict(past3)  # pads 3 -> bucket 4, strips back to 3
    assert out.shape == (3, F, H, W, C)
    assert pred.stats.requests == 1 and pred.stats.samples == 3

    # Same jax key -> same sample; different key -> different sample.
    k = jax.random.PRNGKey(5)
    a = pred.predict(past3[:2], key=k)
    b = pred.predict(past3[:2], key=k)
    c = pred.predict(past3[:2], key=jax.random.PRNGKey(6))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert np.abs(a - c).max() > 1e-4

    with pytest.raises(ValueError, match="exceeds largest bucket"):
        pred.predict(np.zeros((5, P, H, W, C), np.float32))

    # Behind the real serving app + micro-batching queue.
    from crowdmod_tpu.cli.serve import ServingApp

    app = ServingApp(pred).warmup()
    try:
        resp = app.handle_predict({"past": past3.tolist(), "seed": 3})
        got = np.asarray(resp["future"], np.float32)
        assert got.shape == (3, F, H, W, C)
        assert np.isfinite(got).all()
    finally:
        app.close()


def test_artifact_predictor_rejects_mixed_geometry(tiny_trainer, tmp_path):
    from crowdmod_tpu.export_artifact import ArtifactPredictor

    p_ok = str(tmp_path / "a.stablehlo")
    export_sampler(tiny_trainer, p_ok, batch_size=2)

    other = Trainer(
        tiny_trainer.cfg.updated({"MACROPROPS": {"ROWS": H, "COLS": 2 * W}}),
        "DDPM-UNet", seed=0,
    )
    other.setup()
    p_bad = str(tmp_path / "b.stablehlo")
    export_sampler(other, p_bad, batch_size=4)
    with pytest.raises(ValueError, match="differs"):
        ArtifactPredictor([p_ok, p_bad])


def test_export_cli_multiple_buckets(tiny_trainer, tmp_path):
    import yaml

    from crowdmod_tpu.export_artifact import run
    from crowdmod_tpu.train import checkpoint as ckpt

    cfg = tiny_trainer.cfg.updated({
        "DATA_FS": {"SAVE_DIR": str(tmp_path / "ckpts"),
                    "OUTPUT_DIR": str(tmp_path / "out")},
    })
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    saver = Trainer(cfg, "DDPM-UNet", seed=0)
    saver.setup()
    saver.save(str(tmp_path / "ckpts"), "000")
    ckpt.wait_for_saves()

    rc = run([
        "--config-yml-file", str(cfg_path), "--arch", "DDPM-UNet",
        "--batch", "1", "--batch", "2",
        "--output", str(tmp_path / "m.stablehlo"),
    ])
    assert rc == 0
    from crowdmod_tpu.export_artifact import ArtifactPredictor

    pred = ArtifactPredictor([
        str(tmp_path / "m.b1.stablehlo"), str(tmp_path / "m.b2.stablehlo"),
    ])
    assert pred.batch_buckets == (1, 2)
