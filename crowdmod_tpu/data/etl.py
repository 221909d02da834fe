"""Trajectory → macroproperty ETL, vectorized.

Rebuild of the reference's offline pipeline:

  * :func:`bin_frame` — per-timestamp binning of pedestrians into the
    (ROWS, COLS) grid accumulating density, velocity sums and velocity-norm
    variance.  The reference loops over pedestrians twice in Python
    (/root/reference/utils/data.py:81-94); here both passes are
    ``segment_sum`` scatters, jittable and batchable on device.
  * :func:`preprocess_trajectories` — rotation by THETA, mm→m, velocity
    components from speed+angle, rotated-LU computation (data.py:135-169).
  * :func:`filter_by_grid` — spatial LU/grid filter (data.py:116-133).
  * :func:`compute_macroprop_sequences` — sliding (PAST+FUTURE)-frame window
    builder over a file's timespan (computeMacroProps.py:15-76), with the
    OVERLAP/WINDOWSIZE re-stride.
  * :func:`aggregate_atc` — 500 ms per-pedestrian aggregation with the +9 h
    timezone shift (aggregateData.py:11-42).
  * ETH/UCY helpers: frame→unixtime conversion, hotel-rotation special case,
    density-maximizing LU search, per-agent finite-difference velocity
    (preprocessETH.py:9-116, vectorized with groupby-diff).

Outputs are native layout ``(N, T, H, W, 4)`` float32.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from crowdmod_tpu.config import FrozenConfig

ATC_COLUMNS = [
    "time", "personID", "pos_x", "pos_y", "pos_z", "vel", "motion_angle",
    "facing_angle",
]
ATC_READ_COLUMNS = ["time", "personID", "pos_x", "pos_y", "vel", "motion_angle"]


# --------------------------------------------------------------------------
# Core binning (device-side)
# --------------------------------------------------------------------------

def grid_index(pos_x, pos_y, *, rows, cols, dx, dy, lu):
    """Pedestrian position → (i, j) cell index (reference data.py:12-27)."""
    i = jnp.abs(jnp.floor((pos_y - (lu[1] - 1)) / dy)).astype(jnp.int32)
    j = jnp.floor((pos_x - lu[0]) / dx).astype(jnp.int32)
    return i, j


def bin_frame(
    pos_x: jnp.ndarray,
    pos_y: jnp.ndarray,
    vel_x: jnp.ndarray,
    vel_y: jnp.ndarray,
    vel_norm: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    rows: int,
    cols: int,
    dx: float,
    dy: float,
    lu,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Bin one frame's pedestrians → ``(rows, cols, 4)`` macroprop grid.

    ``mask`` marks valid pedestrians (padding slots excluded) — fixed-length
    inputs keep the op jittable; out-of-grid pedestrians are masked too.
    Two scatter-add passes mirror data.py:81-94: sums → means, then squared
    deviations of the velocity norm.
    """
    i, j = grid_index(pos_x, pos_y, rows=rows, cols=cols, dx=dx, dy=dy, lu=lu)
    in_grid = (i >= 0) & (i < rows) & (j >= 0) & (j < cols)
    valid = mask & in_grid
    flat = jnp.where(valid, i * cols + j, 0)
    w = valid.astype(jnp.float32)
    n = rows * cols

    seg = lambda vals: jax.ops.segment_sum(vals * w, flat, num_segments=n)
    rho = seg(jnp.ones_like(w))
    mu_vx = seg(vel_x) / (rho + eps)
    mu_vy = seg(vel_y) / (rho + eps)
    exp_vn = seg(vel_norm) / (rho + eps)

    dev = jnp.square(vel_norm - exp_vn[flat])
    sigma2 = seg(dev) / (rho + eps)

    grid = jnp.stack([rho, mu_vx, mu_vy, sigma2], axis=-1)
    return grid.reshape(rows, cols, 4)


# --------------------------------------------------------------------------
# DataFrame preprocessing (host-side pandas, offline)
# --------------------------------------------------------------------------

def preprocess_trajectories(df: pd.DataFrame, cfg: FrozenConfig, lu=None):
    """Rotate positions/velocities, convert mm→m, add vel components.

    Returns ``(df, rotated_lu)`` — reference data.py:135-169, including the
    dataset-dependent THETA convention (pi−THETA for ATC).
    """
    lu = np.asarray(lu if lu is not None else list(cfg.MACROPROPS.LU), float)
    name = cfg.DATASET.NAME
    theta = float(cfg.MACROPROPS.THETA)
    if name in ("ATC", "ATC4TEST"):
        theta = np.pi - theta
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )

    df = df.copy()
    pos = np.stack([df["pos_x"].to_numpy() / 1000.0,
                    df["pos_y"].to_numpy() / 1000.0])
    pos = rot @ pos
    df["pos_x"], df["pos_y"] = pos[0], pos[1]
    speed = df["vel"].to_numpy() / 1000.0
    ang = df["motion_angle"].to_numpy() + theta
    df["vel_x"] = speed * np.cos(ang)
    df["vel_y"] = speed * np.sin(ang)
    df["vel_norm"] = np.hypot(df["vel_x"], df["vel_y"])

    rotated_lu = rot @ lu
    rotated_lu[0] -= cfg.MACROPROPS.COLS
    return df, rotated_lu


def filter_by_grid(df: pd.DataFrame, cfg: FrozenConfig, lu) -> pd.DataFrame:
    """Keep pedestrians inside the LU-anchored grid (data.py:116-133)."""
    w = cfg.MACROPROPS.COLS * cfg.MACROPROPS.DX
    h = cfg.MACROPROPS.ROWS * cfg.MACROPROPS.DY
    m = (
        (df["pos_x"] >= lu[0]) & (df["pos_x"] < lu[0] + w)
        & (df["pos_y"] <= lu[1]) & (df["pos_y"] > lu[1] - h)
    )
    return df[m]


def _frames_from_df(df, t0, n_frames, time_res):
    """Split a time-sorted df into per-frame pedestrian arrays."""
    t = df["time"].to_numpy()
    edges = t0 + np.arange(n_frames + 1) * np.timedelta64(
        int(time_res * 1e9), "ns"
    )
    idx = np.searchsorted(t, edges)
    cols = ["pos_x", "pos_y", "vel_x", "vel_y", "vel_norm"]
    arrs = {c: df[c].to_numpy(np.float32) for c in cols}
    return [
        {c: arrs[c][idx[k] : idx[k + 1]] for c in cols}
        for k in range(n_frames)
    ]


def compute_macroprop_sequences(
    df: pd.DataFrame, cfg: FrozenConfig, lu, t_init=None, t_final=None
) -> np.ndarray:
    """Build all (P+F)-frame macroprop windows → ``(N, T, H, W, 4)``.

    Mirrors computeMacroPropsATC (computeMacroProps.py:42-63): frames are
    binned once at TIME_RES over the whole span, then windows are views into
    the frame stack (the reference re-bins every window from scratch —
    O(windows × frames) pandas filters; here binning is O(frames) total).
    Window stride is WINDOWSIZE frames when OVERLAP is set, else a full
    window length.
    """
    rows, cols = cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS
    window = cfg.DATASET.PAST_LEN + cfg.DATASET.FUTURE_LEN
    time_res = cfg.MACROPROPS.TIME_RES

    df = df.sort_values("time")
    t = pd.to_datetime(df["time"])
    df = df.assign(time=t)
    t0 = np.datetime64(t_init if t_init is not None else t.min())
    t1 = np.datetime64(t_final if t_final is not None else t.max())
    total_frames = int(
        np.floor((t1 - t0) / np.timedelta64(int(time_res * 1e9), "ns"))
    )
    if total_frames < window:
        return np.zeros((0, window, rows, cols, 4), np.float32)

    binner = jax.jit(
        lambda px, py, vx, vy, vn, m: bin_frame(
            px, py, vx, vy, vn, m,
            rows=rows, cols=cols,
            dx=cfg.MACROPROPS.DX, dy=cfg.MACROPROPS.DY,
            lu=tuple(np.asarray(lu, float)), eps=cfg.MACROPROPS.EPS,
        )
    )
    frames = []
    # Pad each frame's pedestrian list to the max count so one compiled
    # binner serves every frame.
    per_frame = _frames_from_df(df, t0, total_frames, time_res)
    cap = max((len(f["pos_x"]) for f in per_frame), default=1) or 1
    for f in per_frame:
        n = len(f["pos_x"])
        pad = lambda a: np.pad(a, (0, cap - n))
        mask = np.zeros(cap, bool)
        mask[:n] = True
        frames.append(
            np.asarray(
                binner(
                    pad(f["pos_x"]), pad(f["pos_y"]), pad(f["vel_x"]),
                    pad(f["vel_y"]), pad(f["vel_norm"]), mask,
                )
            )
        )
    stack = np.stack(frames)  # (total_frames, H, W, 4)

    overlap = bool(cfg.MACROPROPS.get("OVERLAP"))
    stride = int(cfg.MACROPROPS.get("WINDOWSIZE") or 1) if overlap else window
    starts = range(0, total_frames - window + 1, stride)
    return np.stack([stack[s : s + window] for s in starts]).astype(np.float32)


def read_aggregated_csv(path: str) -> pd.DataFrame:
    """Read an aggregated-trajectory CSV into the canonical column layout.

    Accepts both conventions in the wild: the reference's own aggregation
    output (datetime-string ``time``, leading unnamed index column —
    aggregateData.py:38 ``to_csv`` default) and index-free epoch-seconds
    CSVs (the configuration computeMacroProps.py:38-40 actually parses).
    The reference's sequence builder reads the former *without*
    ``index_col=0``, which silently shifts the positional vel_x/vel_y/
    vel_norm accesses in data.py:85-89 by one column; like
    ``getDataset4Test``, that defect is deliberately not reproduced here.
    """
    df = pd.read_csv(path)
    df = df.drop(columns=[c for c in df.columns if c.startswith("Unnamed")])
    if pd.api.types.is_numeric_dtype(df["time"]):
        df["time"] = pd.to_datetime(df["time"], unit="s")
    else:
        df["time"] = pd.to_datetime(df["time"])
    return df


def macroprops_from_aggregated(
    df: pd.DataFrame, cfg: FrozenConfig
) -> np.ndarray:
    """Aggregated trajectories → ``(N, T, H, W, 4)`` macroprop windows.

    The per-file body of computeMacroPropsATC (computeMacroProps.py:36-63):
    preprocess/rotate → LU filter → bin at TIME_RES → sliding windows, with
    the window span taken from the *unfiltered* file's time extent
    (computeMacroProps.py:44-46).
    """
    pre, rlu = preprocess_trajectories(df, cfg)
    filt = filter_by_grid(pre, cfg, rlu)
    return compute_macroprop_sequences(
        filt, cfg, rlu, t_init=pre["time"].min(), t_final=pre["time"].max()
    )


def to_reference_pickle_layout(seqs: np.ndarray) -> np.ndarray:
    """``(N, T, H, W, C)`` native → ``(N, C, H, W, T)`` reference pickle
    layout (computeMacroProps.py:55-57 ``np.stack`` axis order)."""
    return np.ascontiguousarray(seqs.transpose(0, 4, 2, 3, 1))


# --------------------------------------------------------------------------
# ATC aggregation
# --------------------------------------------------------------------------

def aggregate_atc(df: pd.DataFrame, time_res_ms: int = 500) -> pd.DataFrame:
    """Per-pedestrian mean aggregation in ``time_res_ms`` bins with the
    reference's +9 h timezone shift (aggregateData.py:29-39)."""
    df = df.copy()
    df["time"] = pd.to_datetime(df["time"], unit="s") + pd.to_timedelta(9, "h")
    df = df.sort_values("time")
    return df.groupby(
        [pd.Grouper(key="time", freq=f"{time_res_ms}ms"), "personID"],
        as_index=False,
    ).mean()


def aggregate_atc_files(cfg: FrozenConfig, filenames, in_dir=None, out_dir=None):
    in_dir = Path(in_dir or cfg.DATA_FS.RAW_DATA_DIR)
    out_dir = Path(out_dir or cfg.DATA_FS.AGG_DATA_DIR)
    out_dir.mkdir(parents=True, exist_ok=True)
    for k, fn in enumerate(filenames):
        logging.info("aggregating %s (%d/%d)", fn, k + 1, len(filenames))
        df = pd.read_csv(
            in_dir / fn, names=ATC_COLUMNS, header=None,
            usecols=ATC_READ_COLUMNS,
        )
        aggregate_atc(df).to_csv(out_dir / fn)


# --------------------------------------------------------------------------
# ETH / UCY preprocessing
# --------------------------------------------------------------------------

def eth_frames_to_unixtime(df: pd.DataFrame, init_time: float = 1694563200.0):
    """frame id → seconds (0.4 s per 10 frames, preprocessETH.py:9-17)."""
    df = df.copy()
    df["time"] = init_time + df["time"].astype(float) * 0.4 / 10.0
    return df


def eth_read_raw(path: str, hotel_rotation: bool | None = None) -> pd.DataFrame:
    """Read a tab-separated ETH/UCY txt; rotate biwi_hotel 90°
    (preprocessETH.py:53-54)."""
    df = pd.read_csv(
        path, delimiter="\t", header=None,
        names=["time", "agent_ID", "pos_x", "pos_y"],
    )
    df = eth_frames_to_unixtime(df)
    if hotel_rotation is None:
        hotel_rotation = os.path.basename(path) == "biwi_hotel.txt"
    if hotel_rotation:
        df["pos_x"], df["pos_y"] = -df["pos_y"].copy(), df["pos_x"].copy()
    return df


def crop_to_lu(df: pd.DataFrame, lu, cols: int, rows: int) -> pd.DataFrame:
    """Crop to an LU-anchored window, rebasing coordinates to [0, cols] ×
    [0, rows] (preprocessETH.py newDF_LU)."""
    m = (
        (df["pos_x"] > lu[0]) & (df["pos_x"] < lu[0] + cols)
        & (df["pos_y"] > lu[1] - rows) & (df["pos_y"] < lu[1])
    )
    out = df[m].reset_index(drop=True).copy()
    out["pos_x"] -= lu[0]
    out["pos_y"] -= lu[1] - rows
    return out


def find_max_density_lu(df: pd.DataFrame, cols: int, rows: int):
    """Integer LU window maximizing contained samples (preprocessETH.py:59-78)
    — vectorized with a 2-D histogram + box-sum instead of the O(X·Y) scans
    of cropped dataframes."""
    min_x, min_y = int(df["pos_x"].min()) + 1, int(df["pos_y"].min()) + 1
    max_x, max_y = int(df["pos_x"].max()), int(df["pos_y"].max())
    xs = np.arange(min_x, max_x + 2)
    ys = np.arange(min_y - rows, max_y + 2)
    hist, _, _ = np.histogram2d(df["pos_x"], df["pos_y"], bins=[xs, ys])
    # Box sums over cols × rows unit windows via 2-D cumsum.
    c = np.zeros((hist.shape[0] + 1, hist.shape[1] + 1))
    c[1:, 1:] = hist.cumsum(0).cumsum(1)
    best, best_lu = -1, (0, rows)
    for ix in range(hist.shape[0] - cols + 1):
        for iy in range(hist.shape[1] - rows + 1):
            s = c[ix + cols, iy + rows] - c[ix, iy + rows] - c[ix + cols, iy] + c[ix, iy]
            if s > best:
                best = s
                best_lu = (xs[ix], ys[iy] + rows)
    return best_lu


def add_velocity_and_angle(df: pd.DataFrame) -> pd.DataFrame:
    """Finite-difference speed + motion angle per agent
    (preprocessETH.py:80-116), vectorized with groupby-shift; positions are
    scaled m→mm first as in the reference.  Single-observation agents are
    dropped; each agent's first row copies its second row's values."""
    df = df.copy()
    df["pos_x"] *= 1000.0
    df["pos_y"] *= 1000.0
    df = df[df.groupby("agent_ID")["agent_ID"].transform("size") > 1]
    df = df.sort_values(["agent_ID", "time"]).reset_index(drop=True)

    g = df.groupby("agent_ID")
    dx = df["pos_x"] - g["pos_x"].shift(1)
    dy = df["pos_y"] - g["pos_y"].shift(1)
    dt = df["time"] - g["time"].shift(1)
    df["vel"] = np.hypot(dx, dy) / dt
    df["motion_angle"] = np.arctan2(dy, dx)
    df["vel"] = g["vel"].transform(lambda s: s.bfill())
    df["motion_angle"] = g["motion_angle"].transform(lambda s: s.bfill())
    return df


# --------------------------------------------------------------------------
# Sample counting
# --------------------------------------------------------------------------

def count_samples(pickle_dir: str, out_yaml: str | None = None) -> list:
    """Per-file sample counts → DATA_LIST entries (utils/count/count_samples.py)."""
    import pickle

    import yaml

    entries = []
    for fn in sorted(os.listdir(pickle_dir)):
        if not fn.endswith(".pkl"):
            continue
        with open(os.path.join(pickle_dir, fn), "rb") as f:
            arr = pickle.load(f)
        entries.append([fn, int(len(arr))])
    if out_yaml:
        with open(out_yaml, "w") as f:
            yaml.safe_dump({"DATA_LIST": entries}, f)
    return entries
