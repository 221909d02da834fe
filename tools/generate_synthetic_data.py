#!/usr/bin/env python
"""Generate the synthetic diagonal-walker dataset pickles.

Rebuild of /root/reference/utils/generate_synthetic_data.py:45-66: draws
``--samples`` random test sequences, saves them as ``true_data.pkl``, adds the
deterministic walker field (forward / backward / both), and saves
``synthetic_data.pkl`` — both in the reference pickle layout ``(B, C, H, W,
L)`` so they interop with the standard ingestion path.

Usage::

    python tools/generate_synthetic_data.py \
        --config-yml-file configs/ATC.yml \
        --configList-yml-file ATC_datafiles.yml --samples 64 --kind ALL
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-yml-file", default="configs/ATC.yml")
    p.add_argument("--configList-yml-file", default=None)
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--kind", choices=("FORWARD", "BACKWARD", "ALL"),
                   default="ALL")
    p.add_argument("--vel-x", type=float, default=0.8)
    p.add_argument("--row", type=int, default=6)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import (
        filenames_with_counts,
        load_pickles,
    )
    from crowdmod_tpu.data.synthetic import synthetic_dataset

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    out_dir = args.out_dir or os.path.join(
        "datasets", f"{cfg.DATASET.NAME}_SYNTHETIC"
    )
    os.makedirs(out_dir, exist_ok=True)

    shape = (cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, cfg.DATASET.RAW_SEQ_LEN)
    raw, _ = load_pickles(filenames_with_counts(cfg), 3, shape)
    rng = np.random.default_rng(args.seed)
    idx = rng.permutation(raw.shape[0])[: args.samples]
    true_native = raw[idx]  # (B, T, H, W, 3)
    synth_native = synthetic_dataset(
        true_native, vel_x=args.vel_x, row=args.row, kind=args.kind
    )

    # Back to reference pickle layout (B, C, H, W, L) for interop.
    to_ref = lambda a: np.ascontiguousarray(np.transpose(a, (0, 4, 2, 3, 1)))
    for name, arr in [("true_data", true_native), ("synthetic_data", synth_native)]:
        path = os.path.join(out_dir, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump(to_ref(arr), f)
        print(path, arr.shape)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
