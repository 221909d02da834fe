"""Hyperparameter random-search sweeps (reference train_sweep.py:29-178 +
utils.py:208-268).

The reference drives sweeps through ``wandb.agent``; zero-egress TPU pods
can't, so this driver samples the same search spaces locally with an explicit
PRNG, trains each trial through the unified Trainer, and records every trial
to ``sweep_results.jsonl`` (and to W&B when available).  Note the reference's
``train_sweep.py`` imports a nonexistent ``models.training`` module and is
broken as shipped (train_sweep.py:24); this is the working equivalent.
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from crowdmod_tpu.cli import common_parser, setup_logging


def sweep_space(arch: str) -> dict:
    """Per-arch random-search space (reference get_sweep_configuration,
    utils.py:208-268)."""
    if arch in ("DDPM-UNet", "DDPM-DiT"):
        return {
            "name": "sweep_crowdmod_ddpm",
            "metric": "train_loss",
            "parameters": {
                "learning_rate": {"min": 1e-5, "max": 1e-3},
                "batch_size": {"values": [16, 32, 64]},
                "epochs": {"values": [150, 180, 200]},
                "base_ch": {"values": [16, 32, 64]},
                "dropout_rate": {"values": [0.05, 0.15, 0.25]},
                "time_emb_mult": {"values": [2, 4, 8]},
                "scale": {"values": [0.1, 0.3, 0.5, 0.8]},
                "timesteps": {"values": [500, 1000, 1500]},
            },
        }
    if arch in ("FM-UNet", "FM-DiT"):
        return {
            "name": "sweep_crowdmod_fm",
            "metric": "train_loss",
            "parameters": {
                "learning_rate": {"min": 5e-6, "max": 1e-4},
                "weight_decay": {"values": [0.0003, 0.001, 0.01]},
                "betas": {"values": [[0.5, 0.999], [0.7, 0.999], [0.9, 0.999]]},
                "batch_size": {"values": [16, 32, 64]},
                "epochs": {"values": [150, 180, 200]},
                "base_ch": {"values": [32, 64]},
                "dropout_rate": {"values": [0.05, 0.1, 0.15]},
                "time_emb_mult": {"values": [2, 4, 8]},
                "time_max_pos": {"values": [800, 1000, 1200]},
            },
        }
    if arch == "ConvRNN":
        return {
            "name": "sweep_crowdmod_ConvRNN",
            "metric": "train_loss",
            "parameters": {
                "learning_rate": {"min": 1e-5, "max": 1e-3},
                "batch_size": {"values": [32, 64, 128]},
                "epochs": {"values": [100, 150, 180]},
                "weight_decay": {"values": [0.0003, 0.001, 0.01]},
                "betas": {"values": [[0.5, 0.999], [0.7, 0.999], [0.9, 0.999]]},
                "enc_hidden_ch": {"values": [
                    [16, 64, 64, 96, 96, 96],
                    [32, 64, 64, 96, 96, 96],
                    [16, 64, 64, 128, 128, 128],
                    [32, 64, 64, 128, 128, 128],
                ]},
            },
        }
    raise ValueError(f"architecture {arch!r} not supported for sweeps")


def sample_trial(space: dict, rng: np.random.Generator) -> dict:
    """Draw one point: uniform for {min,max} ranges, choice for values."""
    out = {}
    for name, spec in space["parameters"].items():
        if "values" in spec:
            vals = spec["values"]
            out[name] = vals[int(rng.integers(len(vals)))]
        else:
            out[name] = float(rng.uniform(spec["min"], spec["max"]))
    return out


def trial_overrides(arch: str, trial: dict) -> dict:
    """Translate sweep parameter names into config-tree overrides."""
    family = "CONVRNN" if arch == "ConvRNN" else arch.split("-")[0]
    backbone = None if arch == "ConvRNN" else arch.split("-")[1]
    node: dict = {}
    train_node: dict = {}
    solver: dict = {}

    for k, v in trial.items():
        if k == "learning_rate":
            solver["LR"] = v
        elif k == "weight_decay":
            solver["WEIGHT_DECAY"] = v
        elif k == "betas":
            solver["BETAS"] = list(v)
        elif k == "batch_size":
            pass  # handled at DATASET level below
        elif k == "epochs":
            train_node["EPOCHS"] = v
        elif k == "base_ch":
            node["BASE_CH"] = v
        elif k == "dropout_rate":
            node["DROPOUT_RATE"] = v
        elif k == "time_emb_mult":
            node["TIME_EMB_MULT"] = v
        elif k == "scale":
            pass  # MODEL.DDPM.SCALE, handled below
        elif k == "timesteps":
            pass  # MODEL.DDPM.TIMESTEPS, handled below
        elif k == "time_max_pos":
            pass  # MODEL.FM.TIME_MAX_POS, handled below
        elif k == "enc_hidden_ch":
            enc = list(v)
            node["ENC_HIDDEN_CH"] = enc
            # Keep the shared-state slot constraint
            # (Forecaster: FORC[5,3,1] == ENC[1,3,5]).
            node["FORC_HIDDEN_CH"] = [
                enc[5], enc[5], enc[4], enc[3], enc[2], enc[1], enc[0]
            ]

    if solver:
        train_node["SOLVER"] = solver
    model_node: dict = {}
    if arch == "ConvRNN":
        fam_node = dict(node)
        fam_node["TRAIN"] = train_node
    else:
        fam_node = {backbone: {**node, "TRAIN": train_node}}
    if "scale" in trial:
        fam_node["SCALE"] = trial["scale"]
    if "timesteps" in trial:
        fam_node["TIMESTEPS"] = trial["timesteps"]
    if "time_max_pos" in trial:
        fam_node["TIME_MAX_POS"] = trial["time_max_pos"]
    model_node[family] = fam_node

    overrides: dict = {"MODEL": model_node}
    if "batch_size" in trial:
        overrides["DATASET"] = {"BATCH_SIZE": trial["batch_size"]}
    return overrides


def build_parser():
    p = common_parser("Random-search hyperparameter sweep.")
    p.add_argument("--trials", type=int, default=10)
    p.add_argument("--epochs-per-trial", type=int, default=None,
                   help="Cap epochs per trial (default: sampled value).")
    p.add_argument("--sweep-dir", type=str, default=None)
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import get_training_dataset
    from crowdmod_tpu.train.trainer import Trainer

    base_cfg = load_config(args.config_yml_file, args.configList_yml_file)
    sweep_dir = args.sweep_dir or os.path.join(
        base_cfg.DATA_FS.OUTPUT_DIR, "sweeps", args.arch
    )
    os.makedirs(sweep_dir, exist_ok=True)
    setup_logging(os.path.join(sweep_dir, "sweep.log"))

    space = sweep_space(args.arch)
    rng = np.random.default_rng(args.seed)
    results_path = os.path.join(sweep_dir, "sweep_results.jsonl")
    best = {"loss": float("inf"), "trial": None}

    for i in range(args.trials):
        trial = sample_trial(space, rng)
        cfg = base_cfg.updated(trial_overrides(args.arch, trial))
        epochs = args.epochs_per_trial or trial.get("epochs")
        logging.info("trial %d/%d: %s", i + 1, args.trials, trial)
        t0 = time.time()
        trainer = Trainer(
            cfg, args.arch, seed=args.seed + i,
            run_dir=os.path.join(sweep_dir, f"trial_{i:03d}"),
        )
        train_ds, val_ds = get_training_dataset(
            cfg, trainer.mprops_count, seed=args.seed
        )
        try:
            history = trainer.fit(train_ds, val_ds, epochs=epochs)
            final = history["train_loss"][-1] if history["train_loss"] else float("nan")
        except Exception as e:  # a diverging trial must not kill the sweep
            logging.exception("trial %d failed", i)
            final = float("nan")
            history = {"train_loss": [], "val_loss": []}
        record = {
            "trial": i,
            "params": trial,
            "train_loss": final,
            "val_loss": history["val_loss"][-1] if history["val_loss"] else None,
            "wall_s": time.time() - t0,
        }
        with open(results_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if np.isfinite(final) and final < best["loss"]:
            best = {"loss": final, "trial": i, "params": trial}

    logging.info("sweep done; best trial: %s", json.dumps(best))
    with open(os.path.join(sweep_dir, "best.json"), "w") as f:
        json.dump(best, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
