"""End-to-end CLI tests: train → generate-samples → generate-metrics → sweep
on a tiny pickle fixture, exercising the whole stack the way a user would
(reference train.py / generate_samples.py / generate_metrics.py flows)."""

import json
import os
import pickle

import numpy as np
import pytest
import yaml

from crowdmod_tpu.cli import generate_metrics, generate_samples, sweep, train
from crowdmod_tpu.cli import main as cli_main


@pytest.fixture
def workspace(smoke_cfg, tmp_path):
    """Tiny configs + pickles on disk, mirroring a real dataset layout."""
    h, w, L = 8, 12, 16
    pkl_dir = tmp_path / "pickle"
    pkl_dir.mkdir()
    rng = np.random.default_rng(0)
    files = []
    for k in range(3):
        # Reference pickle layout: (N, C, H, W, L).
        arr = np.abs(rng.normal(size=(4, 4, h, w, L))).astype(np.float32)
        with open(pkl_dir / f"f{k}.pkl", "wb") as f:
            pickle.dump(arr, f)
        files.append([f"f{k}.pkl", 4])

    over = {
        "DATA_FS": {
            "PICKLE_DIR": str(pkl_dir),
            "SAVE_DIR": str(tmp_path / "ckpts"),
            "OUTPUT_DIR": str(tmp_path / "out"),
        },
        "MACROPROPS": {"ROWS": h, "COLS": w},
        "DATASET": {
            "RAW_SEQ_LEN": L, "BATCH_SIZE": 4,
            "TRAIN_FILE_COUNT": 1, "VAL_FILE_COUNT": 1,
            "TEST_FILE_COUNT": 1, "DATASET_TYPE": "ByFilenames",
        },
        "MODEL": {
            "NSAMPLES4PLOTS": 1,
            "DDPM": {
                "TIMESTEPS": 5, "CHECKPOINTS_TO_KEEP": 0,
                "UNET": {
                    "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
                    "APPLY_ATTENTION": [False, False],
                    "DROPOUT_RATE": 0.0,
                    "TRAIN": {"EPOCHS": 1},
                },
            },
        },
        "METRICS": {"CHUNK_REPD_PAST_SEQ": 2},
    }
    cfg_dict = smoke_cfg.updated(over).to_dict()
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    list_path = tmp_path / "list.yml"
    with open(list_path, "w") as f:
        yaml.safe_dump({"DATA_LIST": files}, f)
    return {"cfg": str(cfg_path), "list": str(list_path), "tmp": tmp_path}


def _common(ws):
    return ["--config-yml-file", ws["cfg"], "--configList-yml-file", ws["list"]]


def test_cli_train_then_sample_then_metrics(workspace):
    ws = workspace
    rc = train.run(_common(ws) + ["--arch", "DDPM-UNet",
                                  "--run-dir", str(ws["tmp"] / "run")])
    assert rc == 0
    ckpts = os.listdir(ws["tmp"] / "ckpts")
    assert any("CE000" in c or "000" in c for c in ckpts)
    assert os.path.exists(ws["tmp"] / "run" / "losses.png")

    rc = generate_samples.run(
        _common(ws) + ["--arch", "DDPM-UNet", "--plot-type", "Static",
                       "--output-dir", str(ws["tmp"] / "samples")]
    )
    assert rc == 0
    svgs = [p for p in os.listdir(ws["tmp"] / "samples") if p.endswith(".svg")]
    assert svgs

    rc = generate_metrics.run(
        _common(ws) + ["--arch", "DDPM-UNet", "--metric", "PSNR",
                       "--chunk-repd-past-seq", "2",
                       "--output-dir", str(ws["tmp"] / "metrics")]
    )
    assert rc == 0
    out = os.listdir(ws["tmp"] / "metrics")
    assert any(p.endswith(".csv") for p in out)
    assert "metrics_files.json" in out


def test_cli_sweep(workspace):
    ws = workspace
    rc = sweep.run(
        _common(ws) + ["--arch", "DDPM-UNet", "--trials", "2",
                       "--epochs-per-trial", "1",
                       "--sweep-dir", str(ws["tmp"] / "sweep")]
    )
    assert rc == 0
    results = [
        json.loads(l)
        for l in open(ws["tmp"] / "sweep" / "sweep_results.jsonl")
    ]
    assert len(results) == 2
    assert os.path.exists(ws["tmp"] / "sweep" / "best.json")


def test_cli_dispatch_help(capsys):
    assert cli_main(["--help"]) == 0
    assert "generate-samples" in capsys.readouterr().out
    assert cli_main(["bogus"]) == 2


def test_sweep_space_and_overrides():
    from crowdmod_tpu.cli.sweep import sample_trial, sweep_space, trial_overrides

    rng = np.random.default_rng(0)
    for arch in ("DDPM-UNet", "FM-DiT", "ConvRNN"):
        space = sweep_space(arch)
        trial = sample_trial(space, rng)
        over = trial_overrides(arch, trial)
        assert "MODEL" in over
        if "batch_size" in trial:
            assert over["DATASET"]["BATCH_SIZE"] == trial["batch_size"]
    with pytest.raises(ValueError):
        sweep_space("nope")
