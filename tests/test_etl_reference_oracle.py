"""Live-reference ETL oracle (VERDICT round-4 item 1a).

Round 4's tests/test_etl.py compared `bin_frame` against a *local* numpy
re-derivation of the reference's pedestrian loop; this module holds the ETL
to the same standard as the torch-parity model tests: the mounted reference
program ITSELF is the oracle.  On shared synthetic raw trajectories
(crowdmod_tpu.data.synthetic.synthetic_raw_trajectories) it runs, live:

  * ``preProcessData``             — /root/reference/utils/data.py:135-169
  * ``filterDataByLU``             — data.py:116-133
  * ``filterDataByTime``           — data.py:100-114
  * ``getMacroPropertiesAtTimeStamp`` — data.py:56-96
  * ``computeMacroPropsATC``       — utils/computeMacroProps.py:15-76
  * ``aggregateATCData``           — utils/aggregateData.py:11-42

and asserts our ``etl.py`` (jax segment-sum path) AND the C++
``native.bin_frames`` path match the reference's arrays/pickles to ≤1e-5.

``computeMacroPropsATC`` is driven in its *working* configuration:
aggregated CSVs with an epoch-seconds ``time`` column and no index column.
(Feeding it aggregateATCData's own CSVs re-reads an unnamed index column
that shifts the hard-coded vel_x/vel_y/vel_norm offsets 6:9 in
data.py:85-89 — the published pickles can only have been produced from
index-free inputs, so that is the configuration the oracle reproduces; see
etl.read_aggregated_csv.)
"""

import os
import pickle
import sys

import numpy as np
import pandas as pd  # real pandas: imported before _ref_deps joins sys.path
import pytest

import jax.numpy as jnp

from crowdmod_tpu import native
from crowdmod_tpu.data import etl
from crowdmod_tpu.data.synthetic import (
    synthetic_raw_trajectories, write_atc_raw_csv,
)

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

import matplotlib  # noqa: E402

matplotlib.use("Agg")  # reference utils.data imports utils.plot.plot

# easydict comes from the _ref_deps shim.  The `utils` PACKAGE must resolve
# before /root/reference/utils joins the path (its utils.py would shadow the
# package), so import utils.data first, then append the utils/ dir — only
# needed for computeMacroProps/aggregateData's flat `from data import ...` /
# `from myparser import ...` style — at the END of sys.path.
_STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_ref_deps")
for _p in (_STUBS, REFERENCE):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from easydict import EasyDict as edict  # noqa: E402

import utils.data as ref_data  # noqa: E402 - live reference oracle

_UTILS_DIR = os.path.join(REFERENCE, "utils")
if _UTILS_DIR not in sys.path:
    sys.path.append(_UTILS_DIR)

import aggregateData as ref_agg  # noqa: E402
import computeMacroProps as ref_cmp  # noqa: E402

# Fixture geometry: non-trivial THETA (the shipped ATC value), fractional LU.
ROWS, COLS = 6, 9
THETA = 2.5647
LU = [11.37, 4.21]
PAST, FUT = 5, 3
N_FRAMES = 20
T0 = 1_352_862_000.0


def _ref_cfg(overlap=True, windowsize=1):
    return edict({
        "DATASET": {"NAME": "ATC", "PAST_LEN": PAST, "FUTURE_LEN": FUT},
        "MACROPROPS": {
            "ROWS": ROWS, "COLS": COLS, "DX": 1.0, "DY": 1.0,
            "LU": LU, "EPS": 1e-6, "TIME_RES": 0.5, "THETA": THETA,
            "OVERLAP": overlap, "WINDOWSIZE": windowsize,
        },
    })


def _our_cfg(smoke_cfg, overlap=True, windowsize=1):
    return smoke_cfg.updated({
        "DATASET": {"NAME": "ATC", "PAST_LEN": PAST, "FUTURE_LEN": FUT},
        "MACROPROPS": {
            "ROWS": ROWS, "COLS": COLS, "DX": 1.0, "DY": 1.0,
            "LU": LU, "EPS": 1e-6, "TIME_RES": 0.5, "THETA": THETA,
            "OVERLAP": overlap, "WINDOWSIZE": windowsize,
        },
    })


def _raw_df(subsamples=1, seed=0):
    return synthetic_raw_trajectories(
        n_frames=N_FRAMES, rows=ROWS, cols=COLS, lu=LU, theta=THETA,
        subsamples=subsamples, t0=T0, seed=seed,
    )


def _agg_style_df(seed=0):
    """Aggregated-CSV-schema frame: [time(s), personID, pos_x, pos_y, vel,
    motion_angle] — what computeMacroPropsATC's read path expects."""
    df = _raw_df(seed=seed)
    return df[["time", "personID", "pos_x", "pos_y", "vel", "motion_angle"]]


def test_preprocess_and_lu_filter_vs_live_reference(smoke_cfg):
    """Rotation/mm→m/velocity decomposition and the LU filter match the
    reference row-for-row (data.py:135-169, :116-133)."""
    df = _agg_style_df()
    df = df.assign(time=pd.to_datetime(df["time"], unit="s"))

    ref_out, ref_rlu = ref_data.preProcessData(
        df.copy(), cfg=_ref_cfg(), LU=np.asarray(LU, float)
    )
    ref_filt = ref_data.filterDataByLU(ref_out, cfg=_ref_cfg(), LU=ref_rlu)

    ours_out, rlu = etl.preprocess_trajectories(df.copy(), _our_cfg(smoke_cfg))
    ours_filt = etl.filter_by_grid(ours_out, _our_cfg(smoke_cfg), rlu)

    np.testing.assert_allclose(rlu, np.asarray(ref_rlu, float), atol=1e-12)
    assert len(ours_filt) == len(ref_filt) > 0
    for col in ("pos_x", "pos_y", "vel_x", "vel_y", "vel_norm"):
        np.testing.assert_allclose(
            ours_filt[col].to_numpy(), ref_filt[col].to_numpy(),
            atol=1e-9, err_msg=col,
        )


def test_bin_frame_vs_live_reference(smoke_cfg):
    """Per-frame binning — jax segment-sum AND native C++ — vs the
    reference's two-pass pedestrian loop (data.py:56-96), run live frame by
    frame through its own time filter."""
    cfg_r = _ref_cfg()
    df = _agg_style_df()
    df = df.assign(time=pd.to_datetime(df["time"], unit="s"))
    data, rlu = ref_data.preProcessData(df, cfg=cfg_r, LU=np.asarray(LU, float))
    filt = ref_data.filterDataByLU(data, cfg=cfg_r, LU=rlu)

    t = pd.Timestamp(filt["time"].min())
    want, frames = [], []
    for _ in range(N_FRAMES - 1):
        by_t = ref_data.filterDataByTime(filt.copy(), time=t, cfg=cfg_r)
        rho, mvx, mvy, s2 = ref_data.getMacroPropertiesAtTimeStamp(
            by_t.copy(), cfg_r, LU=rlu
        )
        want.append(np.stack([rho, mvx, mvy, s2], axis=-1))
        frames.append(by_t)
        t += pd.to_timedelta(0.5, unit="s")
    want = np.stack(want)
    assert want[..., 0].sum() > 0

    geo = dict(rows=ROWS, cols=COLS, dx=1.0, dy=1.0,
               lu=tuple(np.asarray(rlu, float)))
    ours = np.stack([
        np.asarray(etl.bin_frame(
            jnp.asarray(f["pos_x"].to_numpy()),
            jnp.asarray(f["pos_y"].to_numpy()),
            jnp.asarray(f["vel_x"].to_numpy()),
            jnp.asarray(f["vel_y"].to_numpy()),
            jnp.asarray(f["vel_norm"].to_numpy()),
            jnp.ones(len(f), bool), **geo,
        ))
        for f in frames
    ])
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-5)

    # Native path: one call over all frames via offsets.
    counts = [len(f) for f in frames]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    cat = lambda col: np.concatenate([f[col].to_numpy() for f in frames])
    native_out = native.bin_frames(
        cat("pos_x"), cat("pos_y"), cat("vel_x"), cat("vel_y"),
        cat("vel_norm"), offsets, **geo,
    )
    np.testing.assert_allclose(native_out, want, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("overlap,windowsize", [
    (True, 1),   # the shipped configuration (ETHUCY_ddpm.yml:19-20)
    (True, 2),
    (False, 1),
])
def test_sequence_builder_vs_live_computemacroprops(
    smoke_cfg, tmp_path, overlap, windowsize
):
    """Full offline sequence builder vs the live reference: the same
    aggregated CSV through computeMacroPropsATC (computeMacroProps.py:15-76)
    and through our read→preprocess→filter→bin→window chain must produce
    identical pickles — same window count, same values ≤1e-5."""
    agg_dir = tmp_path / "agg"
    pkl_dir = tmp_path / "pkl_ref"
    agg_dir.mkdir()
    pkl_dir.mkdir()
    _agg_style_df().to_csv(agg_dir / "walkers.csv", index=False)

    ref_cmp.computeMacroPropsATC(
        _ref_cfg(overlap, windowsize), str(agg_dir) + os.sep,
        str(pkl_dir) + os.sep, ["walkers.csv"],
    )
    with open(pkl_dir / "walkers.pkl", "rb") as f:
        want = pickle.load(f)  # (N, 4, ROWS, COLS, PAST+FUT)

    cfg = _our_cfg(smoke_cfg, overlap, windowsize)
    df = etl.read_aggregated_csv(str(agg_dir / "walkers.csv"))
    ours = etl.to_reference_pickle_layout(etl.macroprops_from_aggregated(df, cfg))

    assert ours.shape == want.shape
    assert want[:, 0].sum() > 0  # non-degenerate: density present
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-5)


def test_aggregate_vs_live_reference(tmp_path):
    """500 ms aggregation vs aggregateATCData run live on the same raw
    headerless sensor CSV (aggregateData.py:11-42): equal rows, bins and
    per-bin means."""
    raw_dir = tmp_path / "raw"
    out_ref = tmp_path / "agg_ref"
    out_ours = tmp_path / "agg_ours"
    for d in (raw_dir, out_ref, out_ours):
        d.mkdir()
    write_atc_raw_csv(_raw_df(subsamples=3), str(raw_dir / "w.csv"))

    col_names = ["time", "personID", "pos_x", "pos_y", "pos_z", "vel",
                 "motion_angle", "facing_angle"]
    read_cols = ["time", "personID", "pos_x", "pos_y", "vel", "motion_angle"]
    ref_agg.aggregateATCData(
        col_names, read_cols, str(raw_dir) + os.sep, str(out_ref) + os.sep,
        ["w.csv"],
    )
    etl.aggregate_atc_files(None, ["w.csv"], in_dir=raw_dir, out_dir=out_ours)

    a = pd.read_csv(out_ref / "w.csv", index_col=0)
    b = pd.read_csv(out_ours / "w.csv", index_col=0)
    assert len(a) == len(b) > 0
    ka = a.sort_values(["time", "personID"]).reset_index(drop=True)
    kb = b.sort_values(["time", "personID"]).reset_index(drop=True)
    assert (ka["time"] == kb["time"]).all()
    assert (ka["personID"] == kb["personID"]).all()
    for col in ("pos_x", "pos_y", "vel", "motion_angle"):
        np.testing.assert_allclose(
            ka[col].to_numpy(), kb[col].to_numpy(), atol=1e-9, err_msg=col
        )
