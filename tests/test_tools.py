"""Automation tooling tests: param counter, DDIM sweep driver, forward-viz."""

import os
import subprocess
import sys

import numpy as np
import pytest

from crowdmod_tpu.cli import train
from crowdmod_tpu.utils.model_info import (
    count_trainable_params,
    param_breakdown,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_param_counting():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(nn.Dense(8)(x))

    params = M().init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    # Dense(8): 3*8+8 = 32; Dense(4): 8*4+4 = 36.  Flax numbers modules by
    # construction order, so Dense_0 is the outer Dense(4).
    assert count_trainable_params(params) == 68
    bd = param_breakdown(params)
    assert bd == {"Dense_0": 36, "Dense_1": 32}


def test_ddim_sweep_driver(workspace):
    ws = workspace
    rc = train.run([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--run-dir", str(ws["tmp"] / "run"),
    ])
    assert rc == 0

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import ddim_sweep
    finally:
        sys.path.pop(0)
    root = str(ws["tmp"] / "ddim")
    rc = ddim_sweep.main([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--dividers", "2", "4",
        "--metric", "PSNR", "--chunk-repd-past-seq", "2",
        "--skip-samples", "--output-root", root,
    ])
    assert rc == 0
    for d in (2, 4):
        out = os.path.join(root, f"DDIM_{d}")
        assert os.path.exists(os.path.join(out, "metrics_files.json"))


def test_visualize_forward_tool(tmp_path):
    out = tmp_path / "fwd.png"
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "visualize_forward.py"),
         "--synthetic", "--out", str(out),
         "--timesteps", "0", "50", "99"],
        capture_output=True, timeout=300, env={**os.environ,
                                               "JAX_PLATFORMS": "cpu"},
    )
    assert rc.returncode == 0, rc.stderr.decode()
    assert out.exists() and out.stat().st_size > 0


def test_generate_synthetic_data_tool(workspace):
    import pickle

    import yaml

    ws = workspace
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import generate_synthetic_data
    finally:
        sys.path.pop(0)
    out = str(ws["tmp"] / "synth")
    rc = generate_synthetic_data.main([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--samples", "4", "--kind", "ALL", "--row", "3", "--out-dir", out,
    ])
    assert rc == 0
    with open(os.path.join(out, "true_data.pkl"), "rb") as f:
        true = pickle.load(f)
    with open(os.path.join(out, "synthetic_data.pkl"), "rb") as f:
        synth = pickle.load(f)
    assert true.shape == synth.shape and true.shape[0] == 4
    # Reference layout (B, C, H, W, L); walker adds density on row 3 along
    # the diagonal and its mirror.
    diff = synth - true
    assert np.all(diff[:, 0, 3, 0, 0] >= 1.0)  # forward walker start
    assert np.allclose(diff[:, 0, 2], 0.0)     # other rows untouched


def test_lambda_sweep_driver(workspace):
    ws = workspace
    rc = train.run([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--run-dir", str(ws["tmp"] / "run"),
    ])
    assert rc == 0
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import lambda_sweep
    finally:
        sys.path.pop(0)
    root = str(ws["tmp"] / "lam")
    rc = lambda_sweep.main([
        "--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"],
        "--arch", "DDPM-UNet", "--lambdas", "0.0", "0.01",
        "--output-root", root, "--view",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(root, "run_lambda_0.0"))
    assert os.path.isdir(os.path.join(root, "run_lambda_0.01"))
    assert os.path.exists(os.path.join(root, "lambda_viewer.html"))


def test_tracker_log_artifact(tmp_path):
    import json as _json

    from crowdmod_tpu.utils.tracker import RunTracker

    art = tmp_path / "x.gif"
    art.write_bytes(b"GIF89a")
    with RunTracker(str(tmp_path / "run"), use_wandb=False) as tr:
        tr.log({"loss": 1.0}, step=0)
        tr.log_artifact(str(art), kind="gifs")
    events = [
        _json.loads(l) for l in open(tmp_path / "run" / "events.jsonl")
    ]
    assert any(e.get("artifact") == str(art) for e in events)


def test_api_docs_in_sync(tmp_path):
    """docs/API.md regenerates identically — API changes must re-run
    tools/gen_api_docs.py (same guard pattern as the config-sync test)."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    committed = (repo / "docs" / "API.md").read_text()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_api_docs.py")],
        check=True, env=env, capture_output=True,
    )
    regenerated = (repo / "docs" / "API.md").read_text()
    assert regenerated == committed, (
        "docs/API.md is stale; run: JAX_PLATFORMS=cpu python "
        "tools/gen_api_docs.py"
    )
    # Spot-check load-bearing public symbols are documented.
    for sym in ("ddpm_sample", "BatchingQueue", "FileWindowStream",
                "typed_config", "MetricsEngine"):
        assert sym in committed, f"{sym} missing from API reference"


@pytest.mark.nightly
def test_soak_http_driver(workspace, tmp_path):
    """The HTTP soak driver end-to-end at toy scale: train → serve → hammer.

    Exercises the full serve stack (ServingApp + ThreadingHTTPServer +
    BatchingQueue) the PERF.md soak rows are produced with.
    """
    import json

    ws = workspace
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import soak_http
    finally:
        sys.path.pop(0)
    out = tmp_path / "soak.json"
    rc = soak_http.main([
        "--arch", "DDPM-UNet", "--config-yml-file", ws["cfg"],
        "--clients", "3", "--req-batch", "2", "--duration", "3",
        "--ramp-s", "0.5", "--batch-buckets", "1", "4", "8",
        "--ddim-divider", "2", "--train-epochs", "1",
        "--workdir", str(ws["tmp"] / "soakwork"), "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["errors"] == 0
    assert report["requests_total"] > 0
    assert report["steady_req_per_s"] > 0
    assert report["latency_ms"]["p95"] >= report["latency_ms"]["p50"]
    # Concurrent keyless batch-2 requests must have coalesced at least once.
    assert report["dispatches"] is not None


@pytest.mark.nightly
def test_training_drill_kill_resume(tmp_path):
    """The kill-mid-run drill end-to-end at toy scale, process level.

    Unit tests cover ``Trainer.resume_from_abort`` in-process
    (test_trainer.py); this drives the path a real operator hits: a
    ``crowdmod train`` OS process SIGINTed mid-run must persist the
    emergency checkpoint from its exception handler, and a second process
    with ``--resume`` must warm-continue to completion with best-checkpoint
    integrity and retention GC (the reference can only warm-start weights,
    train.py:78).  The reference-budget run is VALIDATION.md round 4
    (tools/training_drill.py --kill-epoch 60, 200 epochs, v5e).
    """
    import json

    sys.path.insert(0, REPO)
    try:
        from tools.training_drill import main as drill_main
    finally:
        sys.path.pop(0)
    out = tmp_path / "drill"
    rc = drill_main([
        "--out", str(out), "--epochs", "20", "--kill-epoch", "4",
        "--files", "2", "--per-file", "8", "--batch-size", "8",
        "--timeout", "900",
    ])
    assert rc == 0, "drill postconditions failed (see report.json)"
    report = json.loads((out / "report.json").read_text())
    assert report["phase1"]["abort_checkpoint"] is True
    assert report["checks"]["continuity"] is True
    assert report["checks"]["best_ckpt_is_global_best"] is True
    assert report["checks"]["abort_gc_on_completion"] is True
    assert report["checks"]["retention_policy"] is True
    # Both phases together cover the full budget.
    assert (report["phase1"]["epochs_logged"]
            + report["phase2"]["epochs_logged"]) == 20
