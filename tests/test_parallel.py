"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from crowdmod_tpu.core.schedule import linear_schedule
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.models.backbones import UNet3D
from crowdmod_tpu.models.diffusion import ddpm_loss
from crowdmod_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from crowdmod_tpu.train.optim import adam_with_plateau
from crowdmod_tpu.train.state import TrainState, make_train_step
from crowdmod_tpu.train.trainer import Trainer

H, W, Pst, F, C = 8, 12, 5, 3, 3


def test_virtual_mesh_available():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_train_step_matches_single_device():
    """The data-parallel jitted step computes the same loss/params as the
    unsharded step — XLA inserts the gradient all-reduce from shardings."""
    model = UNet3D(
        out_channels=C, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    data = jnp.asarray(synthetic_walkers(16, H, W, Pst + F))
    past, future = data[:, :Pst], data[:, Pst:]
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((16,)), past)
    sched = linear_schedule(50)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b, past_b, key
        )

    tx = adam_with_plateau(1e-3)
    key = jax.random.PRNGKey(7)

    # Single device.
    state1 = TrainState.create(params, tx)
    step1 = make_train_step(loss_fn, donate=False)
    state1, loss1 = step1(state1, (past, future), key)

    # Data-parallel over the 8-device mesh.
    mesh = make_mesh()
    state2 = TrainState.create(replicate(params, mesh), tx)
    batch = shard_batch((past, future), mesh)
    step2 = make_train_step(loss_fn, donate=False)
    state2, loss2 = step2(state2, batch, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    l1 = jax.tree.leaves(state1.params)[0]
    l2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5)


def test_sharded_batch_placement():
    mesh = make_mesh()
    x = jnp.zeros((16, 4, 4))
    (xs,) = shard_batch((x,), mesh)
    assert xs.sharding == NamedSharding(mesh, P("data"))


def test_param_spec_tp_rules():
    from crowdmod_tpu.parallel.sharding import param_spec

    big = jnp.zeros((256, 256))       # divisible, large → sharded
    small = jnp.zeros((8, 8))         # too small → replicated
    odd = jnp.zeros((256, 37))        # not divisible → replicated
    vec = jnp.zeros((256,))           # 1-D → replicated
    assert param_spec(big, 4, 1 << 12) == P(None, "model")
    assert param_spec(small, 4, 1 << 12) == P()
    assert param_spec(odd, 4, 1 << 12) == P()
    assert param_spec(vec, 4, 1 << 12) == P()
    # model axis of size 1 → always replicated
    assert param_spec(big, 1, 1 << 12) == P()


def test_fsdp_spec_rules():
    from crowdmod_tpu.parallel.sharding import fsdp_spec

    big = jnp.zeros((256, 128))
    # Largest divisible dim goes to "data"; last dim to "model" when TP on.
    assert fsdp_spec(big, 8, 1 << 12, model_size=1) == P("data", None)
    assert fsdp_spec(big, 8, 1 << 12, model_size=4) == P("data", "model")
    # "model" takes the last dim first; "data" falls back to the next one.
    tall = jnp.zeros((64, 512))
    assert fsdp_spec(tall, 8, 1 << 12, model_size=4) == P("data", "model")
    # Small tensors stay replicated; indivisible dims stay replicated.
    assert fsdp_spec(jnp.zeros((8, 8)), 8, 1 << 12) == P()
    assert fsdp_spec(jnp.zeros((37, 37, 37)), 8, 1) == P()
    # 1-D params (biases/scales) shard too when large and divisible.
    assert fsdp_spec(jnp.zeros((4096,)), 8, 1 << 12) == P("data")
    # data axis of size 1 → plain TP behavior.
    assert fsdp_spec(big, 1, 1 << 12, model_size=4) == P(None, "model")


def test_fsdp_train_step_matches_single_device():
    """ZeRO-3 param/opt-state sharding over "data" (plus TP over "model" on
    a 2×4 mesh) computes the same loss and updated params as single-device,
    and the shards are genuinely distributed (1/n params per chip)."""
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized
    from crowdmod_tpu.parallel.sharding import shard_params

    model = DiT4DFactorized(
        out_channels=C, grid_rows=H, grid_cols=W, patch_size=4,
        hidden_size=64, depth=2, num_heads=4, mlp_ratio=2.0,
        dropout_rate=0.0, past_len=Pst, future_len=F, t_patch_size=2,
    )
    data = jnp.asarray(synthetic_walkers(8, H, W, Pst + F))
    past, future = data[:, :Pst], data[:, Pst:]
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((8,)), past)
    sched = linear_schedule(50)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b, past_b, key
        )

    tx = adam_with_plateau(1e-3)
    key = jax.random.PRNGKey(11)

    state1 = TrainState.create(params, tx)
    step = make_train_step(loss_fn, donate=False)
    state1, loss1 = step(state1, (past, future), key)

    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, min_size=1024, mode="fsdp")
    leaves = jax.tree.leaves(sharded)
    specs = {x.sharding.spec for x in leaves}
    assert any("data" in s for s in specs), "no FSDP-sharded parameter"
    assert any("model" in s for s in specs), "no TP-sharded parameter"
    # A sharded leaf holds 1/(product of its spec's axis sizes) per chip.
    fs = next(x for x in leaves if "data" in x.sharding.spec)
    div = int(np.prod([mesh.shape[a] for a in fs.sharding.spec if a]))
    assert div >= 2
    assert fs.addressable_shards[0].data.size == fs.size // div

    state2 = TrainState.create(sharded, tx)
    # Adam moments inherit the FSDP layout from tx.init (no resharding).
    mu = jax.tree.leaves(state2.opt_state)
    assert any(
        "data" in x.sharding.spec
        for x in mu if hasattr(x, "sharding") and x.ndim
    ), "optimizer state did not inherit the FSDP sharding"
    batch = shard_batch((past, future), mesh)
    state2, loss2 = step(state2, batch, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    # Updated params keep their FSDP placement (no silent gather-to-replicated).
    out_specs = {x.sharding.spec for x in jax.tree.leaves(state2.params)}
    assert any("data" in s for s in out_specs)


def test_tp_dit_train_step_matches_single_device():
    """2×4 (data×model) mesh with channel-sharded DiT kernels must produce
    the same loss and updated params as single-device."""
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized
    from crowdmod_tpu.parallel.sharding import shard_params

    model = DiT4DFactorized(
        out_channels=C, grid_rows=H, grid_cols=W, patch_size=4,
        hidden_size=64, depth=2, num_heads=4, mlp_ratio=2.0,
        dropout_rate=0.0, past_len=Pst, future_len=F, t_patch_size=2,
    )
    data = jnp.asarray(synthetic_walkers(8, H, W, Pst + F))
    past, future = data[:, :Pst], data[:, Pst:]
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((8,)), past)
    sched = linear_schedule(50)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b, past_b, key
        )

    tx = adam_with_plateau(1e-3)
    key = jax.random.PRNGKey(3)

    state1 = TrainState.create(params, tx)
    step = make_train_step(loss_fn, donate=False)
    state1, loss1 = step(state1, (past, future), key)

    mesh = make_mesh(data=2, model=4)
    # Low min_size so the 64-dim kernels actually shard over "model".
    sharded = shard_params(params, mesh, min_size=1024)
    specs = {
        s.spec for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, sharded)
        )
    }
    assert P(None, "model") in specs, "expected at least one TP-sharded kernel"
    state2 = TrainState.create(sharded, tx)
    batch = shard_batch((past, future), mesh)
    state2, loss2 = step(state2, batch, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_epoch_scan_dp_matches_per_batch(tmp_path):
    """Whole-epoch lax.scan under a DP mesh (stacked batches sharded on
    axis 1) produces the same losses/params as the per-batch sharded path
    (VERDICT round-1 item 4)."""
    from crowdmod_tpu.train.state import make_epoch_step

    model = UNet3D(
        out_channels=C, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    n_batches, batch = 3, 8
    data = jnp.asarray(synthetic_walkers(n_batches * batch, H, W, Pst + F))
    past, future = data[:, :Pst], data[:, Pst:]
    params = model.init(
        jax.random.PRNGKey(0), future[:batch], jnp.zeros((batch,)),
        past[:batch],
    )
    sched = linear_schedule(50)

    def loss_fn(p, b, key):
        past_b, future_b = b
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b, past_b,
            key,
        )

    # SGD, not Adam: Adam's g/sqrt(v) amplifies float32 summation-order
    # differences between the scanned and per-batch compilations into
    # ±lr-sized param flips, which would test optimizer noise, not sharding.
    import optax

    tx = optax.sgd(1e-3)
    key = jax.random.PRNGKey(9)
    stack = lambda a: a.reshape((n_batches, batch) + a.shape[1:])
    mesh = make_mesh()

    # Per-batch sharded path.
    state1 = TrainState.create(replicate(params, mesh), tx)
    step = make_train_step(loss_fn, donate=False)
    keys = jax.random.split(key, n_batches)
    losses1 = []
    for i in range(n_batches):
        b = shard_batch(
            (past[i * batch:(i + 1) * batch],
             future[i * batch:(i + 1) * batch]), mesh,
        )
        state1, loss = step(state1, b, keys[i])
        losses1.append(float(loss))

    # Whole-epoch scan with axis-1 DP sharding, as Trainer.fit now does.
    from jax.sharding import NamedSharding

    epoch_sharding = NamedSharding(mesh, P(None, "data"))
    stacked = jax.device_put((stack(past), stack(future)), epoch_sharding)
    state2 = TrainState.create(replicate(params, mesh), tx)
    epoch_step = make_epoch_step(loss_fn, donate=False)
    state2, losses2 = epoch_step(state2, stacked, key)

    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_epoch_scan_fsdp_matches_per_batch():
    """Whole-epoch lax.scan with FSDP-sharded params/opt-state (the real-pod
    training path) matches the per-batch FSDP path, and the pinned
    out_shardings keep the scanned state on its setup layout."""
    from crowdmod_tpu.parallel.sharding import shard_params
    from crowdmod_tpu.train.state import make_epoch_step, state_shardings

    model = UNet3D(
        out_channels=C, base_channels=16, base_channels_multiples=(1, 2),
        apply_attention=(False, False), dropout_rate=0.0,
    )
    n_batches, batch = 3, 8
    data = jnp.asarray(synthetic_walkers(n_batches * batch, H, W, Pst + F))
    past, future = data[:, :Pst], data[:, Pst:]
    params = model.init(
        jax.random.PRNGKey(0), future[:batch], jnp.zeros((batch,)),
        past[:batch],
    )
    sched = linear_schedule(50)

    def loss_fn(p, b, key):
        past_b, future_b = b
        return ddpm_loss(
            lambda x, t, c: model.apply(p, x, t, c), sched, future_b, past_b,
            key,
        )

    import optax

    tx = optax.sgd(1e-3)  # see test_epoch_scan_dp_matches_per_batch
    key = jax.random.PRNGKey(21)
    mesh = make_mesh()
    sharded = shard_params(params, mesh, min_size=1024, mode="fsdp")
    assert any(
        "data" in x.sharding.spec for x in jax.tree.leaves(sharded)
    )

    # Per-batch FSDP path.
    state1 = TrainState.create(sharded, tx)
    step = make_train_step(loss_fn, donate=False)
    keys = jax.random.split(key, n_batches)
    losses1 = []
    for i in range(n_batches):
        b = shard_batch(
            (past[i * batch:(i + 1) * batch],
             future[i * batch:(i + 1) * batch]), mesh,
        )
        state1, loss = step(state1, b, keys[i])
        losses1.append(float(loss))

    # Epoch-scan FSDP path with pinned out_shardings.
    from jax.sharding import NamedSharding

    stack = lambda a: a.reshape((n_batches, batch) + a.shape[1:])
    stacked = jax.device_put(
        (stack(past), stack(future)), NamedSharding(mesh, P(None, "data"))
    )
    state2 = TrainState.create(sharded, tx)
    out_sh = state_shardings(state2, mesh)
    specs0 = [x.sharding.spec for x in jax.tree.leaves(state2.params)]
    epoch_step = make_epoch_step(loss_fn, donate=False, out_shardings=out_sh)
    state2, losses2 = epoch_step(state2, stacked, key)

    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    specs2 = [x.sharding.spec for x in jax.tree.leaves(state2.params)]
    assert specs0 == specs2


def test_trainer_fsdp_fit_checkpoint_roundtrip(smoke_cfg, tmp_path):
    """Full Trainer flow under FSDP: fit on the DP mesh with params/opt-state
    sharded over "data", checkpoint, reload (shardings reapplied), sample."""
    from crowdmod_tpu.train.checkpoint import checkpoint_name
    from tests.test_trainer import tiny_cfg, walker_ds

    # BASE_CH 16 so the conv kernels cross shard_params' default min_size
    # and genuinely shard; BASE_CH 8 would replicate everything.
    cfg = tiny_cfg(smoke_cfg, tmp_path).updated(
        {"MODEL": {"DDPM": {"UNET": {"BASE_CH": 16}}}}
    )
    ds = walker_ds(cfg, n=8)
    mesh = make_mesh()
    tr = Trainer(
        cfg, "DDPM-UNet", mesh=mesh, param_sharding="fsdp",
        run_dir=str(tmp_path / "run"),
    ).setup()
    specs0 = [x.sharding.spec for x in jax.tree.leaves(tr.state.params)]
    assert any("data" in s for s in specs0), "trainer params not FSDP-sharded"
    hist = tr.fit(ds, ds)
    assert np.isfinite(hist["train_loss"]).all()
    # Layout stability: the pinned out_shardings keep every leaf exactly
    # where setup placed it (no compiler re-sharding drift across steps).
    specs1 = [x.sharding.spec for x in jax.tree.leaves(tr.state.params)]
    assert specs0 == specs1

    import os

    best = os.path.join(
        cfg.DATA_FS.SAVE_DIR, checkpoint_name(cfg, "DDPM-UNet", "000")
    )
    tr2 = Trainer(
        cfg, "DDPM-UNet", mesh=mesh, param_sharding="fsdp",
        run_dir=str(tmp_path / "run2"),
    ).setup()
    tr2.load(best)
    specs2 = {
        x.sharding.spec for x in jax.tree.leaves(tr2.state.params)
    }
    assert any("data" in s for s in specs2), "load() dropped FSDP sharding"
    past, _ = ds.gather(np.arange(8))
    out = tr2.sample(past, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_mesh_sample_matches_single_device(smoke_cfg, tmp_path):
    """Batch-parallel sampling (past sharded over the data axis, params
    replicated, one jitted reverse chain with sharded outputs) must produce
    the same samples as the unsharded path — including the padded case where
    the batch does not divide the data axis."""
    from tests.test_trainer import tiny_cfg, walker_ds

    cfg = tiny_cfg(smoke_cfg, tmp_path).updated(
        {"MODEL": {"DDPM": {"SAMPLER": "DDPM"}}}
    )
    ds = walker_ds(cfg, n=6)
    past, _ = ds.gather(np.arange(8))

    plain = Trainer(cfg, "DDPM-UNet", run_dir=str(tmp_path / "r0")).setup()
    dp = Trainer(
        cfg, "DDPM-UNet", mesh=make_mesh(), run_dir=str(tmp_path / "r1")
    ).setup()
    key = jax.random.PRNGKey(7)

    ref = plain.sample(past, key)
    out = dp.sample(past, key)
    assert out.sharding.is_equivalent_to(
        NamedSharding(dp.mesh, P("data")), out.ndim
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # Ragged batch (6 % 8 != 0): padded to the axis, then sliced back.
    ref6 = plain.sample(past[:6], key)
    out6 = dp.sample(past[:6], key)
    assert out6.shape == ref6.shape
    np.testing.assert_allclose(np.asarray(out6), np.asarray(ref6), atol=2e-5)
