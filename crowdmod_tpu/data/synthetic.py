"""Synthetic crowd data: deterministic diagonal walkers.

Rebuild of /root/reference/utils/generate_synthetic_data.py:21-66 — injects
known-dynamics "pedestrians" that traverse a fixed row left→right (vx=+v) or
right→left (vx=-v), one column per frame.  Used as the end-to-end integration
fixture (SURVEY.md §4): a model trained on walkers must beat a trivial
predictor on motion direction.

Native layout ``(B, T, H, W, C)``; vectorized scatter instead of the
reference's per-frame Python loop.
"""

from __future__ import annotations

import numpy as np


def _walker(h: int, w: int, t: int, vel_x: float, row: int, forward: bool):
    frames = np.arange(min(t, w))
    cols = frames if forward else (w - 1 - frames)
    grid = np.zeros((t, h, w, 3), dtype=np.float32)
    grid[frames, row, cols, 0] = 1.0
    grid[frames, row, cols, 1] = vel_x if forward else -vel_x
    return grid


def synthetic_walkers(
    batch: int,
    h: int,
    w: int,
    t: int,
    *,
    vel_x: float = 0.8,
    row: int = 6,
    kind: str = "ALL",
) -> np.ndarray:
    """``(B, T, H, W, 3)`` walker field; kind ∈ {FORWARD, BACKWARD, ALL}."""
    grid = np.zeros((t, h, w, 3), dtype=np.float32)
    if kind in ("FORWARD", "ALL"):
        grid += _walker(h, w, t, vel_x, row, forward=True)
    if kind in ("BACKWARD", "ALL"):
        grid += _walker(h, w, t, vel_x, row, forward=False)
    return np.broadcast_to(grid, (batch,) + grid.shape).copy()


def synthetic_raw_trajectories(
    *,
    n_frames: int,
    rows: int,
    cols: int,
    lu,
    theta: float,
    dataset: str = "ATC",
    dx: float = 1.0,
    dy: float = 1.0,
    time_res: float = 0.5,
    walkers_per_row: int = 2,
    subsamples: int = 1,
    t0: float = 1_352_862_000.0,
    speed_mps: float = 2.0,
    jitter: float = 0.15,
    seed: int = 0,
):
    """Walker dynamics expressed as RAW ATC trajectory rows.

    The grid-tensor walkers above are the *output* of the ETL; this is its
    *input*: pedestrians walking one cell per frame along fixed rows, emitted
    in the raw ATC sensor format (reference datasets' schema — epoch-seconds
    ``time``, millimetre ``pos_x/pos_y``, mm/s ``vel``, radian
    ``motion_angle``; aggregateData.py:46-47 column list).  Positions and
    velocity angles are *inverse-rotated* out of the LU-anchored analysis
    grid so that running the full preprocessing chain (data.py:135-169
    rotation → :116-133 LU filter → :56-96 binning) recovers the walker
    field exactly.

    ``subsamples`` > 1 emits that many sensor readings per pedestrian per
    TIME_RES bin (at sub-bin timestamps, positions advancing linearly) so
    the 500 ms aggregation stage (aggregateData.py:29-39) has real work.

    Returns a pandas DataFrame with the full 8-column raw schema.
    """
    import pandas as pd

    theta_eff = float(theta)
    if dataset in ("ATC", "ATC4TEST"):
        theta_eff = np.pi - theta_eff
    c, s = np.cos(theta_eff), np.sin(theta_eff)
    rot = np.array([[c, -s], [s, c]])
    rlu = rot @ np.asarray(list(lu), float)
    rlu[0] -= cols

    rng = np.random.default_rng(seed)
    recs = []
    pid = 0
    cells_per_frame = speed_mps * time_res / dx
    for r in range(rows):
        for k in range(walkers_per_row):
            pid += 1
            forward = (r + k) % 2 == 0
            x0 = (k * cols) / walkers_per_row
            phi = 0.0 if forward else np.pi
            sgn = 1.0 if forward else -1.0
            jx = rng.uniform(-jitter, jitter, n_frames)
            jy = rng.uniform(-jitter, jitter, n_frames)
            for f in range(n_frames):
                base_x = (x0 + sgn * f * cells_per_frame) % cols
                for u in range(subsamples):
                    # Sub-bin advance stays inside the frame's cell so the
                    # aggregated mean lands in the same cell as subsamples=1.
                    frac = u / subsamples
                    gx = rlu[0] + (base_x + 0.5 + jx[f]) * dx \
                        + sgn * frac * 0.1 * dx
                    gy = rlu[1] - (r + 0.5) * dy + jy[f]
                    raw = rot.T @ np.array([gx, gy])
                    recs.append({
                        "time": t0 + f * time_res + frac * time_res,
                        "personID": pid,
                        "pos_x": raw[0] * 1000.0,
                        "pos_y": raw[1] * 1000.0,
                        "pos_z": 1350.0,
                        "vel": speed_mps * 1000.0,
                        "motion_angle": phi - theta_eff,
                        "facing_angle": phi - theta_eff,
                    })
    return pd.DataFrame(recs)


def write_atc_raw_csv(df, path: str) -> None:
    """Write raw trajectories in the on-disk ATC format: headerless CSV with
    the 8 sensor columns (what aggregateData.py:27 reads with ``names=``)."""
    cols = ["time", "personID", "pos_x", "pos_y", "pos_z", "vel",
            "motion_angle", "facing_angle"]
    df[cols].to_csv(path, header=False, index=False)


def synthetic_dataset(
    base: np.ndarray, *, vel_x: float = 0.8, row: int = 6, kind: str = "ALL"
) -> np.ndarray:
    """Add walkers onto real sequences (reference :58-66 semantics).

    ``base``: ``(B, T, H, W, C)`` with C >= 3; returns a copy with the walker
    field added to the first 3 channels.
    """
    b, t, h, w, c = base.shape
    out = np.array(base, dtype=np.float32, copy=True)
    out[..., :3] += synthetic_walkers(b, h, w, t, vel_x=vel_x, row=row, kind=kind)
    return out
