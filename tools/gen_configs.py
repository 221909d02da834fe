#!/usr/bin/env python
"""Generate the bundled dataset configs under configs/.

The YAML schema is the reference project's de-facto public API (SURVEY.md §5.6)
— DATA_FS / MACROPROPS / DATASET / MODEL.{DDPM,FM,CONVRNN} / METRICS trees —
so we keep it key-compatible.  Rather than hand-maintaining ~10 near-identical
files, this script is the single source of truth: per-dataset geometry +
shared model hyperparameters → one YAML per dataset (plus the miniature
"4test" smoke config).  Values (grid geometry, LU bounds, rotation angles,
time resolutions) are the physical constants of the public ATC/HERMES/ETH-UCY
datasets, as used by the reference configs.

Run: ``python tools/gen_configs.py`` (rewrites configs/ in place).
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml

OUT = Path(__file__).resolve().parents[1] / "configs"

# ---------------------------------------------------------------------------
# Per-dataset physical geometry / splits.
# ---------------------------------------------------------------------------
DATASETS = {
    "ATC": dict(
        rows=12, cols=36, dx=1.0, dy=1.0, lu=[38.2789, -15.8076],
        theta=2.5647, time_res=0.5, stride=8, raw_seq_len=16,
        files=(33, 3, 3), split="ByFilenames", raw_ext=".csv",
    ),
    "HERMES-BO": dict(
        rows=12, cols=24, dx=0.5, dy=0.5, lu=[-6, 4],
        theta=0, time_res=0.25, stride=8, raw_seq_len=16,
        files=("NA", "NA", "NA"), split="BySplitRatio", raw_ext=".txt",
    ),
    "HERMES-BN": dict(
        rows=28, cols=16, dx=0.5, dy=0.5, lu=[-3, 8],
        theta=0, time_res=0.25, stride=8, raw_seq_len=16,
        files=("NA", "NA", "NA"), split="BySplitRatio", raw_ext=".txt",
    ),
    "HERMES-CR-90": dict(
        rows=12, cols=20, dx=0.5, dy=0.5, lu=[-4, 5],
        theta=0, time_res=0.25, stride=8, raw_seq_len=16,
        files=("NA", "NA", "NA"), split="BySplitRatio", raw_ext=".txt",
    ),
    "HERMES-CR-90-OBST": dict(
        rows=12, cols=20, dx=0.5, dy=0.5, lu=[-4, 5],
        theta=0, time_res=0.25, stride=8, raw_seq_len=16,
        files=("NA", "NA", "NA"), split="BySplitRatio", raw_ext=".txt",
    ),
    "HERMES-CR-120": dict(
        rows=28, cols=24, dx=0.5, dy=0.5, lu=[-5, 8],
        theta=0, time_res=0.25, stride=10, raw_seq_len=20,
        files=(18, 2, 2), split="BySplitRatio", raw_ext=".txt",
    ),
    "HERMES-CR-120-OBST": dict(
        rows=28, cols=24, dx=0.5, dy=0.5, lu=[-5, 8],
        theta=0, time_res=0.25, stride=10, raw_seq_len=20,
        files=(18, 2, 2), split="BySplitRatio", raw_ext=".txt",
    ),
    "ETH-UCY-4D": dict(
        rows=8, cols=12, dx=1.0, dy=1.0, lu=[12, 8],
        theta=0, time_res=0.4, stride=8, raw_seq_len=16,
        files=(5, 1, 1), split="ByFilenames", raw_ext=".txt",
        filename="ETHUCY",
    ),
}

# ---------------------------------------------------------------------------
# Shared model hyperparameters (canonical ATC values).
# ---------------------------------------------------------------------------


def solver(lr, wd, betas, patience=10):
    return {
        "LR": lr,
        "WEIGHT_DECAY": wd,
        "BETAS": list(betas),
        "SCHEDULER": {"FACTOR": 0.5, "PATIENCE": patience, "MIN_LR": 1.0e-6},
    }


def unet_node(dropout, train):
    return {
        "CONDITION": "Past",
        "CONDITION_HANDLING": "embed",
        "NUM_RES_BLOCKS": 1,
        "BASE_CH": 32,
        "BASE_CH_MULT": [1, 2, 4],
        "APPLY_ATTENTION": [False, False, True, False],
        "DROPOUT_RATE": dropout,
        "TIME_EMB_MULT": 4,
        "TRAIN": train,
    }


def dit_node(train, t_patch=None):
    node = {
        "CONDITION": "Past",
        "PATCH_SIZE": 4,
        "HIDDEN_SIZE": 256,
        "DEPTH": 6,
        "NUM_HEADS": 4,
        "MLP_RATIO": 4.0,
        "DROPOUT_RATE": 0.1,
        "TIME_EMB_MULT": 4,
        "TRAIN": train,
    }
    if t_patch is not None:
        node["T_PATCH_SIZE"] = t_patch
    return node


def model_tree():
    return {
        "NAME": "{}_{}_TE{}_PL{}_FL{}_CE{}_{}.ckpt",
        "NSAMPLES": 1280,
        "NSAMPLES4PLOTS": 20,
        "DDPM": {
            "SAMPLER": "DDPM",
            "TIMESTEPS": 1000,
            "SCALE": 0.5,
            "SIGMA": 0.001,
            "DDIM_DIVIDER": 2,
            "GUIDANCE": "None",
            "LAMBDA_GUIDANCE": 0.004,
            "CHECKPOINTS_TO_KEEP": 7,
            "UNET": unet_node(
                0.1, {"EPOCHS": 200, "SOLVER": solver(5.0e-5, 0.003, (0.5, 0.999))}
            ),
            "DIT": dit_node(
                {"EPOCHS": 1000, "SOLVER": solver(1.0e-4, 0.003, (0.9, 0.999), 20)},
                t_patch=4,
            ),
        },
        "FM": {
            "TIME_MAX_POS": 1000,
            "CHECKPOINTS_TO_KEEP": 7,
            "W_TYPE": "Linear",
            "INTEGRATOR": "Euler",
            "INTEGRATOR_STEPS": {"EULER": 1000, "HEUN": 500},
            "UNET": unet_node(
                0.05, {"EPOCHS": 200, "SOLVER": solver(1.0e-4, 0.001, (0.5, 0.999))}
            ),
            "DIT": dit_node(
                {"EPOCHS": 500, "SOLVER": solver(1.0e-4, 0.001, (0.5, 0.999))}
            ),
        },
        "CONVRNN": {
            "CELL_CLASS": "ConvGRUCell",
            "TEACHER_FORCING": True,
            "ENC_HIDDEN_CH": [16, 64, 64, 96, 96, 96],
            "FORC_HIDDEN_CH": [96, 96, 96, 96, 96, 64, 16],
            "ENC_KERNELS": [3, 3, 3, 3, 3, 3],
            "FORC_KERNELS": [3, 4, 3, 4, 3, 3, 3],
            "TRAIN": {
                "EPOCHS": 600,
                "SOLVER": solver(0.003, 1.0e-4, (0.9, 0.999)),
            },
        },
    }


def dataset_cfg(name: str, geo: dict) -> dict:
    slug = geo.get("filename", name).lower().replace("-", "_")
    train_f, val_f, test_f = geo["files"]
    return {
        "DATA_FS": {
            "RAW_DATA_DIR": f"/datasets/{name}/rawData/",
            "AGG_DATA_DIR": f"/datasets/{name}/aggData/",
            "PICKLE_DIR": f"/datasets/{name}/processed/",
            "OUTPUT_DIR": f"output_{slug}",
            "SAVE_DIR": f"trained_models/{slug}/",
            "USE_PICKLE": False,
        },
        "MACROPROPS": {
            "ROWS": geo["rows"],
            "COLS": geo["cols"],
            "DX": geo["dx"],
            "DY": geo["dy"],
            "LU": geo["lu"],
            "EPS": 1.0e-6,
            "STRIDE": geo["stride"],
            "THETA": geo["theta"],
            "TIME_RES": geo["time_res"],
        },
        "DATASET": {
            "NAME": name,
            "PAST_LEN": 5,
            "FUTURE_LEN": 3,
            "RAW_SEQ_LEN": geo["raw_seq_len"],
            "TRAIN_FILE_COUNT": train_f,
            "VAL_FILE_COUNT": val_f,
            "TEST_FILE_COUNT": test_f,
            "BATCH_SIZE": 64,
            "params": {"shuffle": True, "num_workers": 6, "drop_last": True},
            "DATASET_TYPE": geo["split"],
            "VELOCITY_NORM": False,
            "MAX_RHO_4_PLOT": 6,
            "RAW_EXT": geo["raw_ext"],
        },
        "MODEL": model_tree(),
        "METRICS": {
            "PRED_MPROPS_FACTOR": [1, 1, 1],
            "MPROPS_COUNT": 3,
            "MOTION_FEATURE": {"f": 1, "k": 4, "s": 1, "GAMMA": 0.5},
        },
        # TPU-native additions (not in the reference schema).
        "TPU": {
            "COMPUTE_DTYPE": "bfloat16",
            "MESH": {"DATA": -1, "MODEL": 1},
            "DONATE_BUFFERS": True,
        },
    }


def write(path: Path, tree: dict):
    path.parent.mkdir(parents=True, exist_ok=True)
    header = (
        "# Generated by tools/gen_configs.py — edit that script, not this file.\n"
    )
    path.write_text(header + yaml.safe_dump(tree, sort_keys=False))
    print(f"wrote {path}")


def main():
    for name, geo in DATASETS.items():
        fname = geo.get("filename", name)
        write(OUT / f"{fname}.yml", dataset_cfg(name, geo))

    # Miniature smoke config (reference config/4test/ATC.yml semantics):
    # tiny file split, short epochs, ATC4TEST name.
    smoke = dataset_cfg("ATC", DATASETS["ATC"])
    smoke["DATASET"].update(
        NAME="ATC4TEST", RAW_SEQ_LEN=70,
        TRAIN_FILE_COUNT=3, VAL_FILE_COUNT=2, TEST_FILE_COUNT=1, BATCH_SIZE=32,
    )
    smoke["MODEL"]["DDPM"]["UNET"]["TRAIN"]["EPOCHS"] = 2
    smoke["MODEL"]["DDPM"]["DIT"]["TRAIN"]["EPOCHS"] = 2
    smoke["MODEL"]["FM"]["UNET"]["TRAIN"]["EPOCHS"] = 2
    smoke["MODEL"]["FM"]["DIT"]["TRAIN"]["EPOCHS"] = 2
    smoke["MODEL"]["CONVRNN"]["TRAIN"]["EPOCHS"] = 2
    write(OUT / "4test" / "ATC.yml", smoke)

    # Synthetic-walker variant (reference ATC_synthetic.yml role).
    synth = dataset_cfg("ATC", DATASETS["ATC"])
    synth["DATASET"].update(NAME="ATC-SYNTHETIC")
    synth["MACROPROPS"].update(OVERLAP=True, WINDOWSIZE=1, MPROPS_COUNT=3)
    write(OUT / "ATC_synthetic.yml", synth)


if __name__ == "__main__":
    main()
