"""Native C++ runtime tests: build, parity vs numpy/JAX references, IO.

Every entry point must behave identically with and without the compiled
library (the numpy fallbacks are the oracles here; the JAX binning op is a
second oracle for cm_bin_frames).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from crowdmod_tpu.data.etl import bin_frame
from crowdmod_tpu.native import (
    bin_frames,
    gather_windows,
    native_available,
    read_tensor,
    transpose_to_native,
    write_tensor,
)


def test_native_builds():
    # g++ is part of the baked toolchain; the library must build.
    assert native_available()


def test_transpose_parity():
    a = np.random.default_rng(0).normal(size=(5, 4, 6, 9, 11)).astype(np.float32)
    out = transpose_to_native(a)
    ref = np.transpose(a, (0, 4, 2, 3, 1))
    assert out.shape == (5, 11, 6, 9, 4)
    np.testing.assert_array_equal(out, ref)
    assert out.flags["C_CONTIGUOUS"]


def test_gather_windows_parity():
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(4, 20, 6, 9, 3)).astype(np.float32)
    seq = np.array([0, 2, 3, 1])
    t0 = np.array([0, 5, 12, 7])
    out = gather_windows(raw, seq, t0, window=8)
    ref = raw[seq[:, None], t0[:, None] + np.arange(8)[None, :]]
    np.testing.assert_array_equal(out, ref)


def test_bin_frames_matches_jax_op():
    rng = np.random.default_rng(2)
    n = 300
    lu = (38.2789, -15.8076)
    x = rng.uniform(37, 76, n)     # includes out-of-grid positions
    y = rng.uniform(-17, -2, n)
    vx, vy = rng.normal(0, 1, n), rng.normal(0, 1, n)
    vn = np.hypot(vx, vy)
    offsets = np.array([0, 100, 100, 300])  # middle frame is empty
    out = bin_frames(x, y, vx, vy, vn, offsets, rows=12, cols=36,
                     dx=1.0, dy=1.0, lu=lu)
    assert out.shape == (3, 12, 36, 4)
    assert np.all(out[1] == 0.0)
    for f, (s, e) in enumerate([(0, 100), (100, 100), (100, 300)]):
        if s == e:
            continue
        m = np.ones(e - s, bool)
        ref = bin_frame(
            jnp.array(x[s:e]), jnp.array(y[s:e]), jnp.array(vx[s:e]),
            jnp.array(vy[s:e]), jnp.array(vn[s:e]), jnp.array(m),
            rows=12, cols=36, dx=1.0, dy=1.0, lu=lu,
        )
        np.testing.assert_allclose(out[f], np.asarray(ref), atol=1e-4)


def test_cmb_tensor_io_roundtrip(tmp_path):
    a = np.random.default_rng(3).normal(size=(3, 4, 5)).astype(np.float32)
    p = str(tmp_path / "t.cmb")
    write_tensor(p, a)
    b = read_tensor(p)
    np.testing.assert_array_equal(a, b)
    assert b.shape == a.shape

    with pytest.raises(IOError):
        read_tensor(str(tmp_path / "missing.cmb"))


def test_ingest_uses_native_layout(smoke_cfg, tmp_path):
    """load_pickles must produce the same tensors as the plain numpy path."""
    import pickle

    from crowdmod_tpu.data.ingest import load_pickles

    h, w, L = 4, 6, 10
    arr = np.random.default_rng(4).normal(size=(3, 4, h, w, L)).astype(np.float32)
    p = tmp_path / "a.pkl"
    with open(p, "wb") as f:
        pickle.dump(arr, f)
    native, stats = load_pickles([(str(p), 3)], 3, (h, w, L))
    ref = np.transpose(arr, (0, 4, 2, 3, 1))[..., :3]
    np.testing.assert_array_equal(native, ref)
    assert stats.shape == (3, 4)


@pytest.mark.slow
@pytest.mark.parametrize("sanitizer", ["thread", "address"])
def test_sanitizer_harness(sanitizer):
    """Race/memory validation: every entry point under TSan / ASan+UBSan.

    Runs in a bare process (tools/native_sanitize.py) because in-Python ASan
    collides with jaxlib's uninstrumented exceptions; see VALIDATION.md.
    """
    import subprocess
    import sys

    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "native_sanitize.py")
    proc = subprocess.run([sys.executable, tool, sanitizer],
                         capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_corrupt_cmb_cache_recovers(tmp_path):
    """A truncated .cmb sidecar is dropped and rebuilt from the pickle."""
    import pickle

    from crowdmod_tpu.data.ingest import load_pickle_native

    arr = np.arange(4 * 4 * 3 * 2 * 5, dtype=np.float32).reshape(4, 4, 3, 2, 5)
    p = tmp_path / "d.pkl"
    with open(p, "wb") as f:
        pickle.dump(arr, f)
    good = load_pickle_native(str(p), mprops_count=4)  # writes the cache
    cmb = str(p) + ".cmb"
    assert os.path.exists(cmb)
    data = open(cmb, "rb").read()
    with open(cmb, "wb") as f:
        f.write(data[: len(data) // 2])  # truncate mid-payload
    os.utime(cmb)  # keep it newer than the pickle
    again = load_pickle_native(str(p), mprops_count=4)
    np.testing.assert_array_equal(good, again)
    # Cache was rebuilt intact.
    assert open(cmb, "rb").read() == data
