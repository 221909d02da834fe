"""Streaming input pipeline: double-buffered device prefetch, file
streaming, multi-host file sharding."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdmod_tpu.data.prefetch import (
    FileWindowStream, device_prefetch, host_shard,
)


def test_device_prefetch_preserves_order_and_values():
    rng = np.random.default_rng(0)
    src = [(rng.normal(size=(4, 3)).astype(np.float32),
            rng.normal(size=(4, 2)).astype(np.float32)) for _ in range(7)]
    out = list(device_prefetch(iter(src), depth=2))
    assert len(out) == 7
    for (a, b), (da, db) in zip(src, out):
        assert isinstance(da, jax.Array)
        np.testing.assert_array_equal(a, np.asarray(da))
        np.testing.assert_array_equal(b, np.asarray(db))


def test_device_prefetch_with_sharding():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crowdmod_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    sharding = NamedSharding(mesh, P("data"))
    src = [np.arange(8 * 6, dtype=np.float32).reshape(8, 6) for _ in range(3)]
    out = list(device_prefetch(iter(src), sharding=sharding))
    assert len(out) == 3
    for x in out:
        assert len(x.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(x), src[0])


def test_device_prefetch_propagates_source_errors():
    def bad():
        yield np.zeros(3, np.float32)
        raise RuntimeError("disk on fire")

    it = device_prefetch(bad())
    next(it)
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(it)
    with pytest.raises(ValueError):
        next(device_prefetch(iter([]), depth=0))


def test_host_shard_round_robin():
    files = [f"f{i}" for i in range(10)]
    shards = [host_shard(files, i, 3) for i in range(3)]
    assert shards[0] == ["f0", "f3", "f6", "f9"]
    assert shards[1] == ["f1", "f4", "f7"]
    assert sorted(sum(shards, [])) == sorted(files)
    # Single-process default covers everything.
    assert host_shard(files) == files
    with pytest.raises(ValueError):
        host_shard(files, 3, 3)


def test_file_window_stream_matches_resident_dataset(tmp_path):
    """Streaming epoch == resident WindowDataset epoch on the same files."""
    from crowdmod_tpu.data.windows import WindowDataset

    h, w, L, n = 4, 6, 12, 3
    rng = np.random.default_rng(1)
    paths, arrays = [], []
    for k in range(2):
        arr = rng.normal(size=(n, 4, h, w, L)).astype(np.float32)
        p = tmp_path / f"f{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(arr, f)
        paths.append(str(p))
        arrays.append(arr)

    stream = FileWindowStream(
        paths, past_len=5, future_len=3, stride=4, mprops_count=3,
    )
    got = list(stream.batches(batch_size=2, shuffle=False))
    assert got and all(p.shape == (2, 5, h, w, 3) for p, _ in got)

    # Expected: per-file resident datasets, same batch walk.
    expected = []
    for arr in arrays:
        native = np.ascontiguousarray(
            np.transpose(arr, (0, 4, 2, 3, 1))[..., :3]
        )
        ds = WindowDataset(jnp.asarray(native), past_len=5, future_len=3,
                           stride=4)
        order = np.arange(len(ds))
        for b in range(len(order) // 2):
            expected.append(ds.gather(order[b * 2:(b + 1) * 2]))
    assert len(got) == len(expected)
    for (gp, gf), (ep, ef) in zip(got, expected):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ep))
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ef))


def test_file_window_stream_velocity_norm_matches_resident(tmp_path):
    """Streaming VELOCITY_NORM == resident global-stats normalization.

    Guards the advisor finding that the stream silently skipped
    normalize_velocity: stats must be GLOBAL (whole corpus), not per-file.
    """
    from crowdmod_tpu.data.ingest import channel_stats, normalize_velocity

    h, w, L, n = 4, 6, 12, 3
    rng = np.random.default_rng(7)
    paths, natives = [], []
    for k in range(2):
        # Distinct velocity ranges per file so per-file stats would diverge.
        arr = (rng.normal(size=(n, 4, h, w, L)) * (k + 1)).astype(np.float32)
        p = tmp_path / f"f{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(arr, f)
        paths.append(str(p))
        natives.append(np.ascontiguousarray(
            np.transpose(arr, (0, 4, 2, 3, 1))[..., :3]
        ))

    stream = FileWindowStream(
        paths, past_len=5, future_len=3, stride=4, mprops_count=3,
        velocity_norm=True,
    )
    got = list(stream.batches(batch_size=2, shuffle=False))

    corpus = np.concatenate(natives, axis=0)
    stats = channel_stats(corpus)
    np.testing.assert_allclose(stream.stats[:, 2:], stats[:, 2:], rtol=1e-6)

    from crowdmod_tpu.data.windows import WindowDataset

    expected = []
    for native in natives:
        ds = WindowDataset(jnp.asarray(normalize_velocity(native, stats)),
                           past_len=5, future_len=3, stride=4)
        order = np.arange(len(ds))
        for b in range(len(order) // 2):
            expected.append(ds.gather(order[b * 2:(b + 1) * 2]))
    assert len(got) == len(expected)
    for (gp, gf), (ep, ef) in zip(got, expected):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ep), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ef), rtol=1e-6)


def test_stream_feeds_sharded_train_step(tmp_path, smoke_cfg):
    """FileWindowStream → device_prefetch(sharded) → mesh Trainer step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crowdmod_tpu.data.synthetic import synthetic_walkers
    from crowdmod_tpu.parallel.mesh import make_mesh
    from crowdmod_tpu.train.trainer import Trainer

    h, w = 8, 12
    paths = []
    for k in range(2):
        raw = synthetic_walkers(4, h, w, 16)
        ref_layout = np.transpose(raw, (0, 4, 2, 3, 1)).astype(np.float32)
        p = tmp_path / f"w{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(ref_layout, f)
        paths.append(str(p))

    mesh = make_mesh(data=8)
    sharding = NamedSharding(mesh, P("data"))
    cfg = smoke_cfg.updated({
        "MACROPROPS": {"ROWS": h, "COLS": w},
        "MODEL": {"DDPM": {"TIMESTEPS": 5, "UNET": {
            "BASE_CH": 8, "BASE_CH_MULT": [1, 2],
            "APPLY_ATTENTION": [False, False], "DROPOUT_RATE": 0.0,
            "TRAIN": {"EPOCHS": 1}}}},
    })
    tr = Trainer(cfg, "DDPM-UNet", mesh=mesh,
                 run_dir=str(tmp_path / "run")).setup()
    stream = FileWindowStream(paths, past_len=5, future_len=3, stride=4,
                              mprops_count=3)
    key = jax.random.PRNGKey(0)
    losses = []
    for batch in device_prefetch(stream.batches(8, shuffle=True),
                                 sharding=sharding):
        key, sub = jax.random.split(key)
        tr.state, loss = tr._train_step(tr.state, batch, sub)
        losses.append(float(loss))
    assert len(losses) >= 2 and np.isfinite(losses).all()


def test_file_window_stream_trains(tmp_path, smoke_cfg):
    """A Trainer epoch can consume the stream directly (shape contract)."""
    from crowdmod_tpu.data.synthetic import synthetic_walkers

    h, w = 8, 12
    paths = []
    for k in range(2):
        raw = synthetic_walkers(3, h, w, 16)  # (n, L, H, W, C) native
        ref_layout = np.transpose(raw, (0, 4, 2, 3, 1))  # back to (n,C,H,W,L)
        p = tmp_path / f"w{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(ref_layout.astype(np.float32), f)
        paths.append(str(p))

    stream = FileWindowStream(paths, past_len=5, future_len=3, stride=8,
                              mprops_count=3)
    seen = 0
    for past, future in device_prefetch(stream.batches(2, shuffle=True)):
        assert past.shape == (2, 5, h, w, 3)
        assert future.shape == (2, 3, h, w, 3)
        seen += 1
    assert seen >= 2


def test_files_ahead_two_file_budget(tmp_path, monkeypatch):
    """The loader must not read file k+1 until the consumer holds file k:
    at most two files resident (one consumed + one buffered/loading)."""
    import threading
    import time

    h, w, L, n = 4, 6, 12, 2
    paths = []
    rng = np.random.default_rng(0)
    for k in range(4):
        arr = rng.normal(size=(n, 4, h, w, L)).astype(np.float32)
        p = tmp_path / f"f{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(arr, f)
        paths.append(str(p))

    stream = FileWindowStream(paths, past_len=5, future_len=3, stride=4,
                              mprops_count=3)
    loads = []
    lock = threading.Lock()
    real = FileWindowStream._load_host

    def counting_load(self, path):
        with lock:
            loads.append(path)
        return real(self, path)

    monkeypatch.setattr(FileWindowStream, "_load_host", counting_load)

    it = stream._files_ahead()
    next(it)  # starts the loader; consumer now holds file 0
    time.sleep(0.6)
    # Loader may buffer file 1 but must not have started file 2.
    assert len(loads) == 2
    next(it)
    time.sleep(0.6)
    assert len(loads) == 3
    next(it)
    next(it)
    with pytest.raises(StopIteration):
        next(it)
    assert loads == paths


def _alive(name: str) -> int:
    import threading

    return sum(
        t.is_alive() and t.name == name for t in threading.enumerate()
    )


def _wait_until(cond, timeout=5.0):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return cond()


def test_device_prefetch_releases_worker_on_abandon():
    """Closing the generator early must release the worker thread (and the
    device batches it holds) instead of leaking it blocked on put."""
    base = _alive("crowdmod-prefetch")
    src = (np.zeros((2, 2), np.float32) for _ in range(1000))
    it = device_prefetch(src, depth=1)
    next(it)
    it.close()
    assert _wait_until(lambda: _alive("crowdmod-prefetch") <= base), \
        "prefetch worker leaked after generator close"


def test_file_stream_releases_loader_on_abandon(tmp_path):
    base = _alive("crowdmod-file-loader")
    h, w, L = 4, 6, 12
    paths = []
    rng = np.random.default_rng(0)
    for k in range(6):
        arr = rng.normal(size=(2, 4, h, w, L)).astype(np.float32)
        p = tmp_path / f"f{k}.pkl"
        with open(p, "wb") as f:
            pickle.dump(arr, f)
        paths.append(str(p))
    stream = FileWindowStream(paths, past_len=5, future_len=3, stride=4,
                              mprops_count=3)
    it = stream._files_ahead()
    next(it)
    it.close()
    assert _wait_until(lambda: _alive("crowdmod-file-loader") <= base), \
        "file loader thread leaked after generator close"
