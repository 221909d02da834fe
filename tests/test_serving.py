"""Serving-layer tests: bucket padding, warmup compile caching, mesh path."""

import numpy as np
import pytest

import jax

from crowdmod_tpu.cli import train
from crowdmod_tpu.serving import Predictor, load_predictor


@pytest.fixture
def trained(workspace):
    ws = workspace
    rc = train.run([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--run-dir", str(ws["tmp"] / "run"),
    ])
    assert rc == 0
    return ws


def test_predictor_buckets_and_stats(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"],
        batch_buckets=(2, 4),
    ).warmup()
    assert set(pred._compiled) == {2, 4}

    past = np.random.default_rng(0).normal(size=(3, 5, 8, 12, 3)).astype(np.float32)
    out = pred.predict(past)
    assert out.shape == (3, 3, 8, 12, 3)  # padded to 4, sliced back to 3
    assert pred.stats.requests == 1 and pred.stats.samples == 3
    assert pred.mean_latency_ms > 0

    with pytest.raises(ValueError):
        pred.predict(np.zeros((5, 5, 8, 12, 3), np.float32))


def test_predictor_deterministic_under_key(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"], batch_buckets=(2,)
    )
    past = np.zeros((2, 5, 8, 12, 3), np.float32)
    key = jax.random.PRNGKey(42)
    a = pred.predict(past, key=key)
    b = pred.predict(past, key=key)
    np.testing.assert_array_equal(a, b)


def test_predictor_mesh_parallel(trained):
    ws = trained
    pred = load_predictor(
        ws["cfg"], "DDPM-UNet", datafiles_yml=ws["list"],
        data_parallel=True, batch_buckets=(8,),
    )
    past = np.zeros((8, 5, 8, 12, 3), np.float32)
    out = pred.predict(past)
    assert out.shape == (8, 3, 8, 12, 3)
    assert np.isfinite(out).all()
