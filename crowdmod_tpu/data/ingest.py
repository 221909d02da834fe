"""Pickle ingestion and dataset split strategies.

Rebuild of /root/reference/utils/dataset.py:72-252 and utils.py:21-88 on the
native layout: macroprop pickles (reference layout ``(N, C, H, W, L)``) load
into one preallocated host array, transpose once to ``(N, L, H, W, C)``, and
move to device as a single buffer that the WindowDataset gathers from.

Split strategies (DATASET.DATASET_TYPE):
  * ``ByFilenames``  — shuffle files, TRAIN/VAL/TEST_FILE_COUNT partition
                       (dataset.py:108-146);
  * ``BySplitRatio`` — load everything, 0.9/0.1 window-level split with a
                       fixed seed (dataset.py:204-231);
  * fixed-past       — single pickle under ``PICKLE_DIR/4sampling/`` at
                       batch = full dataset (dataset.py:233-252).
"""

from __future__ import annotations

import logging
import os
import pickle
import random
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from crowdmod_tpu.config import FrozenConfig
from crowdmod_tpu.data.windows import WindowDataset


def filenames_with_counts(cfg: FrozenConfig) -> list[tuple[str, int]]:
    """DATA_LIST entries → full pickle paths + sample counts.

    Handles both reference DATA_LIST forms (utils.py:21-56): ``[file, n]``
    pairs (ATC/HERMES datafiles) and plain filename lists (ETH-UCY DSlist),
    where the count is read from the pickle header on demand.
    """
    raw_ext = cfg.DATASET.get("RAW_EXT", ".csv")
    out = []
    for entry in cfg.DATA_LIST:
        if isinstance(entry, (list, tuple)):
            filename, n = entry
            n = int(n)
        else:
            filename, n = entry, None
        filename = str(filename)
        for ext in (raw_ext, ".csv", ".txt"):
            if filename.endswith(ext):
                filename = filename[: -len(ext)]
                break
        if not filename.endswith(".pkl"):
            filename += ".pkl"
        path = os.path.join(cfg.DATA_FS.PICKLE_DIR, filename)
        if n is None:
            with open(path, "rb") as f:
                n = len(pickle.load(f))
        out.append((path, n))
    return out


def channel_stats(data: np.ndarray) -> np.ndarray:
    """Per-channel (mean, std, min, max) → ``(C, 4)`` (dataset.py:100-104)."""
    c = data.shape[-1]
    stats = np.empty((c, 4))
    for i in range(c):
        ch = data[..., i]
        stats[i] = (ch.mean(), ch.std(), ch.min(), ch.max())
        logging.info(
            "channel %d stats: mean=%.4f std=%.4f min=%.4f max=%.4f",
            i, *stats[i],
        )
    return stats


def _load_one(path: str, use_cmb: bool) -> np.ndarray:
    """Load one macroprop file, maintaining a ``.cmb`` binary sidecar cache.

    First load unpickles and writes ``<file>.cmb``; later loads hit the
    threaded native reader (no unpickling).  Disable with
    ``CROWDMOD_CMB_CACHE=0``.
    """
    from crowdmod_tpu import native

    cmb = str(path) + ".cmb"
    if use_cmb and os.path.exists(cmb) and (
        os.path.getmtime(cmb) >= os.path.getmtime(path)
    ):
        try:
            return native.read_tensor(cmb)
        except (IOError, ValueError, AssertionError) as e:
            # Half-written sidecar (crash mid-write) must not poison loading
            # forever: drop it and fall through to the pickle, which rewrites
            # a fresh cache below.
            logging.warning("corrupt cmb cache %s (%s); rebuilding", cmb, e)
            try:
                os.remove(cmb)
            except OSError:
                pass
    with open(path, "rb") as f:
        arr = np.asarray(pickle.load(f), np.float32)
    if use_cmb:
        try:
            native.write_tensor(cmb, arr)
        except OSError:
            logging.info("could not write cmb cache next to %s", path)
    return arr


def load_pickle_native(path: str, mprops_count: int = 4) -> np.ndarray:
    """Load ONE macroprop pickle → native ``(n, L, H, W, C)`` float32.

    Single-file unit of the streaming pipeline
    (:class:`crowdmod_tpu.data.prefetch.FileWindowStream`): .cmb sidecar
    cache + threaded layout transpose, no whole-corpus preallocation.
    """
    use_cmb = os.environ.get("CROWDMOD_CMB_CACHE", "1") != "0"
    arr = _load_one(path, use_cmb)
    from crowdmod_tpu.native import transpose_to_native

    return np.ascontiguousarray(transpose_to_native(arr)[..., :mprops_count])


def load_pickles(
    files_and_counts: list[tuple[str, int]],
    mprops_count: int,
    per_sample_shape: tuple[int, int, int],  # (H, W, L)
) -> tuple[np.ndarray, np.ndarray]:
    """Load macroprop pickles → native ``(N, L, H, W, C)`` float32 + stats.

    Pickles are in reference layout ``(n, 4, H, W, L)``; counts come from the
    datafiles YAML so the output is preallocated once (dataset.py:72-106).
    """
    h, w, L = per_sample_shape
    total = sum(n for _, n in files_and_counts)
    data = np.empty((total, 4, h, w, L), np.float32)
    at = 0
    use_cmb = os.environ.get("CROWDMOD_CMB_CACHE", "1") != "0"
    for k, (path, n) in enumerate(files_and_counts):
        logging.info("loading %s (%d/%d)", path, k + 1, len(files_and_counts))
        try:
            data[at : at + n] = _load_one(path, use_cmb)
        except MemoryError:
            # Reference behavior: log and continue with zeros for this file
            # rather than aborting the whole run (dataset.py:93-96).
            logging.error("MemoryError loading %s; slots left zeroed", path)
            data[at : at + n] = 0.0
        at += n
    # Threaded C++ layout transpose when the native runtime is built
    # (numpy transpose fallback inside).
    from crowdmod_tpu.native import transpose_to_native

    native = transpose_to_native(data)[..., :mprops_count]
    return np.ascontiguousarray(native), channel_stats(native)


def normalize_velocity(data: np.ndarray, stats: np.ndarray) -> np.ndarray:
    """Min-max velocity channels into [-1, 1] when DATASET.VELOCITY_NORM
    (reference CustomTransform, dataset.py:9-20)."""
    out = data.copy()
    for ch in (1, 2):
        lo, hi = stats[ch, 2], stats[ch, 3]
        rng = hi - lo if hi > lo else 1.0  # constant channel → map to -1
        out[..., ch] = (data[..., ch] - lo) / rng * 2.0 - 1.0
    return out


def _window_ds(cfg: FrozenConfig, raw: np.ndarray, mprops_count: int):
    if cfg.DATASET.get("VELOCITY_NORM"):
        raw = normalize_velocity(raw, channel_stats(raw))
    return WindowDataset(
        jnp.asarray(raw[..., :mprops_count]),
        past_len=cfg.DATASET.PAST_LEN,
        future_len=cfg.DATASET.FUTURE_LEN,
        stride=cfg.MACROPROPS.STRIDE,
    )


def split_by_filenames(
    cfg: FrozenConfig,
    files_and_counts,
    mprops_count: int = 4,
    seed: int | None = None,
    which: tuple[str, ...] = ("train", "val", "test"),
) -> dict[str, WindowDataset | None]:
    """File-level split: shuffle, then TRAIN/VAL/TEST_FILE_COUNT partition."""
    files = list(files_and_counts)
    rng = random.Random(seed)
    rng.shuffle(files)
    n_train = cfg.DATASET.TRAIN_FILE_COUNT
    n_val = cfg.DATASET.VAL_FILE_COUNT
    n_test = cfg.DATASET.TEST_FILE_COUNT
    shape = (
        cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, cfg.DATASET.RAW_SEQ_LEN
    )
    parts = {
        "train": files[:n_train],
        "val": files[n_train : n_train + n_val],
        "test": files[n_train + n_val : n_train + n_val + n_test],
    }
    out: dict[str, WindowDataset | None] = {}
    for name in ("train", "val", "test"):
        if name not in which or not parts[name]:
            out[name] = None
            continue
        data, _ = load_pickles(parts[name], mprops_count, shape)
        out[name] = _window_ds(cfg, data, mprops_count)
    return out


def split_by_ratio(
    cfg: FrozenConfig,
    files_and_counts,
    mprops_count: int = 4,
    split_ratio: float = 0.9,
    seed: int = 0,
) -> dict[str, WindowDataset]:
    """Window-level 90/10 split with a fixed shuffle seed (dataset.py:204-231).

    Implemented as two WindowDatasets sharing one device buffer, restricted
    to disjoint window-id subsets.
    """
    shape = (cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, cfg.DATASET.RAW_SEQ_LEN)
    data, _ = load_pickles(files_and_counts, mprops_count, shape)
    full = _window_ds(cfg, data, mprops_count)
    n = len(full)
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(split_ratio * n)

    def restricted(ids):
        ds = WindowDataset(
            full.raw, past_len=full.past_len, future_len=full.future_len,
            stride=full.stride,
        )
        ds.indices = full.indices[ids]
        return ds

    return {
        "train": restricted(perm[:n_train]),
        "val": None,
        "test": restricted(perm[n_train:]),
    }


def fixed_past_dataset(cfg: FrozenConfig, mprops_count: int = 4) -> WindowDataset:
    """Fixed sampling set from ``PICKLE_DIR/4sampling/`` (dataset.py:233-252)."""
    d = Path(cfg.DATA_FS.PICKLE_DIR) / "4sampling"
    filename = sorted(os.listdir(d))[0]
    # Same single-file loader as the streaming path: threaded native
    # transpose + .cmb sidecar cache (keep the full channel set — _window_ds
    # slices to mprops_count after optional velocity normalization).
    native = load_pickle_native(str(d / filename))
    return _window_ds(cfg, native, mprops_count)


def get_training_dataset(cfg: FrozenConfig, mprops_count: int, seed=None):
    """→ (train_ds, val_ds) per DATASET_TYPE (reference utils.py:58-70)."""
    fc = filenames_with_counts(cfg)
    kind = cfg.DATASET.DATASET_TYPE
    if kind == "ByFilenames":
        parts = split_by_filenames(cfg, fc, mprops_count, seed=seed,
                                   which=("train", "val"))
    elif kind == "BySplitRatio":
        parts = split_by_ratio(cfg, fc, mprops_count)
    else:
        raise ValueError(f"unsupported DATASET_TYPE {kind!r}")
    return parts["train"], parts["val"]


def get_test_dataset(
    cfg: FrozenConfig, mprops_count: int, from_fixed_past: bool = False,
    seed=None,
):
    """→ test_ds (reference utils.py:72-88)."""
    if from_fixed_past:
        return fixed_past_dataset(cfg, mprops_count)
    fc = filenames_with_counts(cfg)
    kind = cfg.DATASET.DATASET_TYPE
    if kind == "ByFilenames":
        return split_by_filenames(
            cfg, fc, mprops_count, seed=seed, which=("test",)
        )["test"]
    if kind == "BySplitRatio":
        return split_by_ratio(cfg, fc, mprops_count)["test"]
    raise ValueError(f"unsupported DATASET_TYPE {kind!r}")
