"""End-to-end test of tools/plot_fixed_crowd.py on a synthetic raw CSV."""

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plot_fixed_crowd_tool(smoke_cfg, tmp_path):
    cfg = smoke_cfg
    rows, cols = cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS
    lu = np.asarray(list(cfg.MACROPROPS.LU), float)
    theta = float(cfg.MACROPROPS.THETA)
    if cfg.DATASET.NAME in ("ATC", "ATC4TEST"):
        theta = np.pi - theta
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    lu_r = rot @ lu
    lu_r[0] -= cols

    # Desired rotated-frame positions inside the grid → invert the rotation
    # to produce raw mm coordinates the tool will re-rotate.
    rng = np.random.default_rng(0)
    n_frames = cfg.DATASET.PAST_LEN + cfg.DATASET.FUTURE_LEN
    time_res = cfg.MACROPROPS.TIME_RES
    t0 = pd.Timestamp("2020-01-01 10:00:00")
    recs = []
    for f in range(n_frames):
        for _ in range(10):
            px = lu_r[0] + rng.uniform(0.2, cols - 0.2) * cfg.MACROPROPS.DX
            py = lu_r[1] - rng.uniform(0.2, rows - 0.2) * cfg.MACROPROPS.DY
            raw = rot.T @ np.array([px, py]) * 1000.0
            recs.append({
                "time": t0 + pd.to_timedelta(f * time_res, "s"),
                "personID": len(recs),
                "pos_x": raw[0], "pos_y": raw[1],
                "vel": rng.uniform(500, 1500),
                "motion_angle": rng.uniform(-np.pi, np.pi),
            })
    csv = tmp_path / "agg.csv"
    pd.DataFrame(recs).to_csv(csv, index=False)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import plot_fixed_crowd
    finally:
        sys.path.pop(0)
    out_dir = str(tmp_path / "fixed")
    rc = plot_fixed_crowd.main([
        "--config-yml-file", os.path.join(REPO, "configs", "4test", "ATC.yml"),
        "--agg-csv", str(csv),
        "--t-init", "2020-01-01 10:00:00",
        "--out-dir", out_dir,
    ])
    assert rc == 0
    files = os.listdir(out_dir)
    assert "raw_crowd.png" in files
    assert f"macroprops_f{n_frames}.png" in files
    # Some pedestrians must actually have been binned into frame 1.
    assert os.path.getsize(os.path.join(out_dir, "macroprops_f1.png")) > 0
