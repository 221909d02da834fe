"""ETL parity tests: binning vs a reference-style numpy oracle, trajectory
preprocessing, sequence building, ETH helpers, and pickle ingestion."""

import pickle

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from crowdmod_tpu.data import etl, ingest

ROWS, COLS = 4, 6
GEO = dict(rows=ROWS, cols=COLS, dx=1.0, dy=1.0, lu=(0.0, 4.0))


def _oracle_bin(px, py, vx, vy, vn, eps=1e-6):
    """Two-pass pedestrian loop like reference data.py:74-96."""
    i = np.abs(np.floor((py - (GEO["lu"][1] - 1)) / GEO["dy"]).astype(int))
    j = np.floor((px - GEO["lu"][0]) / GEO["dx"]).astype(int)
    rho = np.zeros((ROWS, COLS))
    svx = np.zeros((ROWS, COLS))
    svy = np.zeros((ROWS, COLS))
    svn = np.zeros((ROWS, COLS))
    for k in range(len(px)):
        rho[i[k], j[k]] += 1
        svx[i[k], j[k]] += vx[k]
        svy[i[k], j[k]] += vy[k]
        svn[i[k], j[k]] += vn[k]
    mvx, mvy = svx / (rho + eps), svy / (rho + eps)
    evn = svn / (rho + eps)
    s2 = np.zeros((ROWS, COLS))
    for k in range(len(px)):
        s2[i[k], j[k]] += (vn[k] - evn[i[k], j[k]]) ** 2
    s2 = s2 / (rho + eps)
    return np.stack([rho, mvx, mvy, s2], -1)


def test_bin_frame_matches_pedestrian_loop():
    rng = np.random.default_rng(0)
    n = 40
    px = rng.uniform(0, COLS, n).astype(np.float32)
    py = rng.uniform(4 - ROWS + 0.01, 4, n).astype(np.float32)
    vx = rng.normal(size=n).astype(np.float32)
    vy = rng.normal(size=n).astype(np.float32)
    vn = np.hypot(vx, vy)
    ours = np.asarray(
        etl.bin_frame(
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(vx),
            jnp.asarray(vy), jnp.asarray(vn),
            jnp.ones(n, bool), **GEO,
        )
    )
    want = _oracle_bin(px, py, vx, vy, vn)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=1e-5)


def test_bin_frame_masks_out_of_grid():
    px = jnp.asarray([0.5, 100.0])
    py = jnp.asarray([3.5, 3.5])
    z = jnp.zeros(2)
    grid = etl.bin_frame(px, py, z, z, z, jnp.ones(2, bool), **GEO)
    assert float(grid[..., 0].sum()) == 1.0


def test_preprocess_rotation(atc_cfg):
    df = pd.DataFrame({
        "pos_x": [1000.0], "pos_y": [0.0],
        "vel": [1000.0], "motion_angle": [0.0],
    })
    out, rlu = etl.preprocess_trajectories(df, atc_cfg)
    theta = np.pi - atc_cfg.MACROPROPS.THETA
    np.testing.assert_allclose(out["pos_x"], np.cos(theta), atol=1e-6)
    np.testing.assert_allclose(out["pos_y"], np.sin(theta), atol=1e-6)
    np.testing.assert_allclose(out["vel_norm"], 1.0, atol=1e-6)
    # rotated LU shifted left by COLS.
    lu = np.asarray(list(atc_cfg.MACROPROPS.LU))
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    np.testing.assert_allclose(rlu, rot @ lu - [atc_cfg.MACROPROPS.COLS, 0])


def _traj_df(n_frames=20, time_res=0.5):
    """One pedestrian walking right at 1 cell/frame inside the grid."""
    t0 = pd.Timestamp("2020-01-01")
    rows = []
    for k in range(n_frames):
        rows.append({
            "time": t0 + pd.to_timedelta(k * time_res, "s"),
            "pos_x": 0.5 + (k % COLS),
            "pos_y": 3.5,
            "vel_x": 1.0, "vel_y": 0.0, "vel_norm": 1.0,
        })
    return pd.DataFrame(rows)


def test_compute_macroprop_sequences(smoke_cfg):
    cfg = smoke_cfg.updated({
        "MACROPROPS": {"ROWS": ROWS, "COLS": COLS, "LU": [0.0, 4.0],
                        "OVERLAP": True, "WINDOWSIZE": 1},
    })
    seqs = etl.compute_macroprop_sequences(_traj_df(), cfg, lu=(0.0, 4.0))
    window = cfg.DATASET.PAST_LEN + cfg.DATASET.FUTURE_LEN
    assert seqs.shape[1:] == (window, ROWS, COLS, 4)
    assert seqs.shape[0] > 0
    # Each frame holds exactly one pedestrian.
    np.testing.assert_allclose(seqs[0, :, :, :, 0].sum(axis=(1, 2)), 1.0)
    # The walker advances one column per frame (row 0 for pos_y=3.5, LU_y=4).
    assert seqs[0, 0, 0, 0, 0] == 1.0
    assert seqs[0, 1, 0, 1, 0] == 1.0


def test_aggregate_atc():
    df = pd.DataFrame({
        "time": [0.0, 0.1, 0.2, 0.6],
        "personID": [1, 1, 2, 1],
        "pos_x": [0.0, 1.0, 5.0, 2.0],
        "pos_y": [0.0, 1.0, 5.0, 2.0],
        "vel": [1.0, 2.0, 3.0, 4.0],
        "motion_angle": [0.0, 0.0, 0.0, 0.0],
    })
    agg = etl.aggregate_atc(df)
    # Person 1 has two samples in bin 0 (mean pos 0.5) and one in bin 1.
    p1 = agg[agg.personID == 1].sort_values("time")
    assert len(p1) == 2
    np.testing.assert_allclose(p1.iloc[0]["pos_x"], 0.5)
    # +9 h shift applied.
    assert p1.iloc[0]["time"].hour == 9


def test_eth_helpers(tmp_path):
    raw = tmp_path / "biwi_hotel.txt"
    lines = []
    for k in range(4):
        lines.append(f"{k*10}\t1\t{1.0+k}\t{2.0}")
    raw.write_text("\n".join(lines))
    df = etl.eth_read_raw(str(raw))
    # Hotel rotation: (x, y) → (−y, x).
    np.testing.assert_allclose(df["pos_x"], -2.0)
    np.testing.assert_allclose(df["pos_y"], [1.0, 2.0, 3.0, 4.0])
    # Time advances 0.4 s per 10 frames.
    np.testing.assert_allclose(np.diff(df["time"]), 0.4, rtol=1e-6)

    vel = etl.add_velocity_and_angle(df)
    # Walker moves +1 m/0.4 s in y (pos in mm): 2500 mm/s.
    np.testing.assert_allclose(vel["vel"], 2500.0, rtol=1e-6)
    np.testing.assert_allclose(vel["motion_angle"], np.pi / 2, rtol=1e-6)


def test_find_max_density_lu():
    rng = np.random.default_rng(1)
    # Cluster at x∈[10,12], y∈[5,7]; sparse elsewhere.
    dense = pd.DataFrame({
        "pos_x": rng.uniform(10, 12, 200),
        "pos_y": rng.uniform(5, 7, 200),
    })
    sparse = pd.DataFrame({
        "pos_x": rng.uniform(0, 20, 20),
        "pos_y": rng.uniform(0, 10, 20),
    })
    df = pd.concat([dense, sparse])
    lu = etl.find_max_density_lu(df, cols=3, rows=3)
    cropped = etl.crop_to_lu(df, lu, 3, 3)
    assert len(cropped) >= 200 * 0.9


def test_pickle_ingest_and_splits(smoke_cfg, tmp_path):
    h, w, L = 4, 6, 16
    pkl_dir = tmp_path / "processed"
    pkl_dir.mkdir()
    files = []
    for k in range(3):
        arr = np.random.default_rng(k).normal(
            size=(5, 4, h, w, L)
        ).astype(np.float32)
        with open(pkl_dir / f"f{k}.pkl", "wb") as f:
            pickle.dump(arr, f)
        files.append([f"f{k}.csv", 5])

    cfg = smoke_cfg.updated({
        "DATA_FS": {"PICKLE_DIR": str(pkl_dir)},
        "MACROPROPS": {"ROWS": h, "COLS": w},
        "DATASET": {
            "RAW_SEQ_LEN": L, "TRAIN_FILE_COUNT": 2, "VAL_FILE_COUNT": 1,
            "TEST_FILE_COUNT": 0, "DATASET_TYPE": "ByFilenames",
        },
        "DATA_LIST": files,
    })
    train, val = ingest.get_training_dataset(cfg, mprops_count=3, seed=0)
    assert train is not None and val is not None
    past, future = train.gather(np.arange(2))
    assert past.shape == (2, 5, h, w, 3)
    assert future.shape == (2, 3, h, w, 3)

    # Layout conversion: pickles are (N,C,H,W,L) reference layout.
    cfg2 = cfg.updated({"DATASET": {"DATASET_TYPE": "BySplitRatio"}})
    parts = ingest.split_by_ratio(cfg2, ingest.filenames_with_counts(cfg2), 3)
    n_total = len(parts["train"]) + len(parts["test"])
    assert len(parts["train"]) == int(0.9 * n_total)

    # Sample counter.
    entries = etl.count_samples(str(pkl_dir), str(tmp_path / "list.yml"))
    assert entries == [["f0.pkl", 5], ["f1.pkl", 5], ["f2.pkl", 5]]


def test_velocity_norm_transform():
    data = np.zeros((2, 4, 3, 3, 3), np.float32)
    data[..., 1] = np.linspace(-2, 2, data[..., 1].size).reshape(data[..., 1].shape)
    data[..., 2] = 5.0
    stats = ingest.channel_stats(data)
    out = ingest.normalize_velocity(data, stats)
    assert out[..., 1].min() == -1.0 and out[..., 1].max() == 1.0
