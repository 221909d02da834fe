import jax.numpy as jnp
import numpy as np

from crowdmod_tpu.data.synthetic import synthetic_dataset, synthetic_walkers
from crowdmod_tpu.data.windows import WindowDataset, window_indices


def test_window_indices_match_reference_semantics():
    """Same (seq, t) enumeration as MacropropsDataset (dataset.py:29-38)."""
    n, total, window, stride = 3, 16, 8, 8
    idx = window_indices(n, total, window, stride)
    expect = [
        (s, t)
        for s in range(n)
        for t in range(0, total - window + 1, stride)
    ]
    assert [tuple(r) for r in idx] == expect


def test_gather_past_future_split():
    n, t_raw, h, w, c = 4, 16, 3, 5, 3
    raw = jnp.arange(n * t_raw * h * w * c, dtype=jnp.float32).reshape(
        n, t_raw, h, w, c
    )
    ds = WindowDataset(raw, past_len=5, future_len=3, stride=8)
    past, future = ds.gather(np.array([0, 3]))
    assert past.shape == (2, 5, h, w, c)
    assert future.shape == (2, 3, h, w, c)
    seq, t0 = ds.indices[3]
    np.testing.assert_array_equal(future[1], raw[seq, t0 + 5 : t0 + 8])


def test_epoch_batching_drop_last():
    raw = jnp.zeros((5, 16, 2, 2, 3))
    ds = WindowDataset(raw, past_len=5, future_len=3, stride=8)  # 10 windows
    batches = list(ds.batches(4, shuffle=True, drop_last=True, seed=1))
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 4


def test_synthetic_walkers_move_diagonally():
    grid = synthetic_walkers(1, 12, 36, 8, kind="FORWARD")
    # Frame l has the walker at (row 6, col l) with vx +0.8.
    for l in range(8):
        assert grid[0, l, 6, l, 0] == 1.0
        assert grid[0, l, 6, l, 1] == np.float32(0.8)
    assert float(np.abs(grid[..., 2]).max()) == 0.0


def test_synthetic_dataset_adds_to_base():
    base = np.ones((2, 8, 12, 36, 3), np.float32)
    out = synthetic_dataset(base, kind="BACKWARD")
    assert out[0, 0, 6, 35, 0] == 2.0  # 1 (base) + 1 (walker)
    np.testing.assert_allclose(out[0, 0, 6, 35, 1], 1 - 0.8, rtol=1e-6)


def test_epoch_arrays_sharded_gather_matches_unsharded():
    """Mesh training gathers the epoch straight into the DP layout; the
    values must match the plain gather and actually land sharded."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    raw = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 12, 6, 8, 3)).astype(np.float32)
    )
    ds = WindowDataset(raw, past_len=5, future_len=3, stride=2)
    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))
    sharding = NamedSharding(mesh, P(None, "data"))

    plain = ds.epoch_arrays(8, shuffle=True, seed=3)
    sharded = ds.epoch_arrays(8, shuffle=True, seed=3, sharding=sharding)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding.is_equivalent_to(sharding, b.ndim)
