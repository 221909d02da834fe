"""Native (C++) host-runtime bindings.

The TPU compute path is JAX/XLA/Pallas; the host-side data path around it is
C++ (``src/crowdmod_native.cpp``): threaded layout transpose, window-batch
gather, trajectory→macroprop binning, and the ``.cmb`` binary tensor cache.
Each entry point has a numpy fallback, so the framework works (slower)
without a toolchain; ``native_available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import logging
from functools import lru_cache

import numpy as np

from crowdmod_tpu.native.build import build_library


@lru_cache(maxsize=1)
def _lib():
    path = build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError as e:
        logging.warning("native library load failed: %s", e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.cm_transpose_nchwl_to_nlhwc.argtypes = [f32p, f32p] + [i64] * 5
    lib.cm_gather_windows.argtypes = (
        [f32p] + [i64] * 5 + [i64p, i64p, i64, i64, f32p]
    )
    lib.cm_bin_frames.argtypes = (
        [f64p] * 5 + [i64p, i64, i64, i64]
        + [ctypes.c_double] * 5 + [f32p]
    )
    lib.cm_write_tensor.argtypes = [
        ctypes.c_char_p, f32p, i64p, ctypes.c_int32
    ]
    lib.cm_write_tensor.restype = ctypes.c_int
    lib.cm_tensor_ndim.argtypes = [ctypes.c_char_p, i64p]
    lib.cm_tensor_ndim.restype = ctypes.c_int
    lib.cm_read_tensor.argtypes = [ctypes.c_char_p, f32p, i64]
    lib.cm_read_tensor.restype = ctypes.c_int
    return lib


def native_available() -> bool:
    return _lib() is not None


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# ---------------------------------------------------------------------------
# Layout transpose
# ---------------------------------------------------------------------------

def transpose_to_native(arr: np.ndarray) -> np.ndarray:
    """Reference pickle layout ``(N, C, H, W, L)`` → framework layout
    ``(N, L, H, W, C)``, threaded in C++ when available."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    n, c, h, w, l = arr.shape
    lib = _lib()
    if lib is None:
        return np.ascontiguousarray(np.transpose(arr, (0, 4, 2, 3, 1)))
    out = np.empty((n, l, h, w, c), dtype=np.float32)
    lib.cm_transpose_nchwl_to_nlhwc(_f32(arr), _f32(out), n, c, h, w, l)
    return out


# ---------------------------------------------------------------------------
# Window gather
# ---------------------------------------------------------------------------

def gather_windows(
    raw: np.ndarray, seq_idx: np.ndarray, t0: np.ndarray, window: int
) -> np.ndarray:
    """Pack windows ``raw[seq[i], t0[i]:t0[i]+window]`` → ``(B, window, H, W,
    C)`` with threaded memcpy."""
    raw = np.ascontiguousarray(raw, dtype=np.float32)
    n, l, h, w, c = raw.shape
    seq_idx = np.ascontiguousarray(seq_idx, dtype=np.int64)
    t0 = np.ascontiguousarray(t0, dtype=np.int64)
    nw = len(seq_idx)
    lib = _lib()
    if lib is None:
        offs = t0[:, None] + np.arange(window)[None, :]
        return raw[seq_idx[:, None], offs]
    out = np.empty((nw, window, h, w, c), dtype=np.float32)
    lib.cm_gather_windows(
        _f32(raw), n, l, h, w, c, _i64(seq_idx), _i64(t0), nw, window,
        _f32(out),
    )
    return out


# ---------------------------------------------------------------------------
# Trajectory binning
# ---------------------------------------------------------------------------

def bin_frames(
    x: np.ndarray, y: np.ndarray, vx: np.ndarray, vy: np.ndarray,
    vnorm: np.ndarray, offsets: np.ndarray, *,
    rows: int, cols: int, dx: float, dy: float, lu, eps: float = 1e-6,
) -> np.ndarray:
    """Bin per-frame pedestrian lists → ``(F, rows, cols, 4)`` macroprops.

    ``offsets`` has length F+1; frame f owns rows [offsets[f], offsets[f+1])
    of the flat arrays.  Threaded over frames in C++; numpy fallback loops.
    """
    conv = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    x, y, vx, vy, vnorm = map(conv, (x, y, vx, vy, vnorm))
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    f = len(offsets) - 1
    lib = _lib()
    if lib is not None:
        out = np.empty((f, rows, cols, 4), dtype=np.float32)
        lib.cm_bin_frames(
            _f64(x), _f64(y), _f64(vx), _f64(vy), _f64(vnorm),
            _i64(offsets), f, rows, cols,
            ctypes.c_double(dx), ctypes.c_double(dy),
            ctypes.c_double(lu[0]), ctypes.c_double(lu[1]),
            ctypes.c_double(eps), _f32(out),
        )
        return out

    out = np.zeros((f, rows, cols, 4), dtype=np.float32)
    for fi in range(f):
        s, e = offsets[fi], offsets[fi + 1]
        i = np.abs(np.floor((y[s:e] - (lu[1] - 1)) / dy)).astype(np.int64)
        j = np.floor((x[s:e] - lu[0]) / dx).astype(np.int64)
        ok = (i >= 0) & (i < rows) & (j >= 0) & (j < cols)
        cell = (i * cols + j)[ok]
        ncell = rows * cols
        rho = np.bincount(cell, minlength=ncell).astype(np.float64)
        svx = np.bincount(cell, weights=vx[s:e][ok], minlength=ncell)
        svy = np.bincount(cell, weights=vy[s:e][ok], minlength=ncell)
        svn = np.bincount(cell, weights=vnorm[s:e][ok], minlength=ncell)
        mean_vn = svn / (rho + eps)
        dev = (vnorm[s:e][ok] - mean_vn[cell]) ** 2
        sdev = np.bincount(cell, weights=dev, minlength=ncell)
        grid = np.stack([
            rho, svx / (rho + eps), svy / (rho + eps), sdev / (rho + eps)
        ], -1)
        out[fi] = grid.reshape(rows, cols, 4).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# .cmb tensor IO
# ---------------------------------------------------------------------------

def write_tensor(path: str, arr: np.ndarray) -> None:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    lib = _lib()
    shape = np.array(arr.shape, dtype=np.int64)
    if lib is not None:
        rc = lib.cm_write_tensor(
            path.encode(), _f32(arr), _i64(shape), np.int32(arr.ndim)
        )
        if rc != 0:
            raise IOError(f"cm_write_tensor failed ({rc}) for {path}")
        return
    with open(path, "wb") as fp:
        fp.write(b"CMB1")
        fp.write(np.int32(arr.ndim).tobytes())
        fp.write(shape.tobytes())
        fp.write(arr.tobytes())


def read_tensor(path: str) -> np.ndarray:
    lib = _lib()
    if lib is not None:
        shape = np.zeros(8, dtype=np.int64)
        ndim = lib.cm_tensor_ndim(path.encode(), _i64(shape))
        if ndim <= 0:
            raise IOError(f"cm_tensor_ndim failed ({ndim}) for {path}")
        shape = shape[:ndim]
        out = np.empty(int(np.prod(shape)), dtype=np.float32)
        rc = lib.cm_read_tensor(path.encode(), _f32(out), out.size)
        if rc != 0:
            raise IOError(f"cm_read_tensor failed ({rc}) for {path}")
        return out.reshape(shape)
    with open(path, "rb") as fp:
        assert fp.read(4) == b"CMB1", f"bad magic in {path}"
        ndim = int(np.frombuffer(fp.read(4), np.int32)[0])
        shape = np.frombuffer(fp.read(8 * ndim), np.int64)
        data = np.frombuffer(fp.read(), np.float32)
        return data.reshape(shape).copy()
