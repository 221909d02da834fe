"""Shape/pytree tests for every backbone over the reference grid geometries
(SURVEY.md §4b).  All grids use PAST_LEN=5, FUTURE_LEN=3."""

import jax
import jax.numpy as jnp
import pytest

from crowdmod_tpu.models.backbones import (
    DiT2D,
    DiT4DFactorized,
    DiT4DJoint,
    DiT4DTube,
    UNet3D,
)

# (rows, cols) for ATC, HERMES-BO, HERMES-BN, HERMES-CR-90, HERMES-CR-120,
# ETH-UCY (configs/*.yml).
GRIDS = [(12, 36), (12, 24), (28, 16), (12, 20), (28, 24), (8, 12)]
P, F = 5, 3


def _data(h, w, c=3, b=2):
    k = jax.random.PRNGKey(0)
    past = jax.random.normal(k, (b, P, h, w, c))
    future = jax.random.normal(k, (b, F, h, w, c))
    t = jnp.array([0, 500])
    return future, t, past


@pytest.mark.parametrize("hw", GRIDS)
@pytest.mark.parametrize("channels", [3, 4])
def test_unet_shapes(hw, channels):
    h, w = hw
    future, t, past = _data(h, w, channels)
    model = UNet3D(
        out_channels=channels, base_channels=8,
        base_channels_multiples=(1, 2), apply_attention=(False, True),
    )
    params = model.init(jax.random.PRNGKey(1), future, t, past)
    out = model.apply(params, future, t, past)
    assert out.shape == future.shape
    assert jnp.all(jnp.isfinite(out))


def test_unet_unconditional():
    # Unconditioned input must still have a cleanly halvable frame count
    # (the UNet downsamples time as well as space).
    future = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 12, 36, 3))
    t = jnp.array([0, 500])
    model = UNet3D(
        out_channels=3, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, False), condition="None",
    )
    params = model.init(jax.random.PRNGKey(1), future, t, None)
    out = model.apply(params, future, t, None)
    assert out.shape == future.shape


DIT_KW = dict(
    out_channels=3, past_len=P, future_len=F, patch_size=4,
    hidden_size=32, depth=2, num_heads=2, dropout_rate=0.0,
)
# Grids divisible by patch 4 in both dims.
DIT_GRIDS = [(12, 36), (12, 24), (28, 16), (12, 20), (28, 24), (8, 12)]


@pytest.mark.parametrize("hw", DIT_GRIDS)
def test_dit2d_shapes(hw):
    h, w = hw
    future, t, past = _data(h, w)
    model = DiT2D(grid_rows=h, grid_cols=w, **DIT_KW)
    params = model.init(jax.random.PRNGKey(1), future, t, past)
    out = model.apply(params, future, t, past)
    assert out.shape == future.shape


@pytest.mark.parametrize("hw", [(12, 36), (8, 12)])
def test_dit4d_variants(hw):
    h, w = hw
    future, t, past = _data(h, w)
    for model in [
        DiT4DTube.make(grid_rows=h, grid_cols=w, **DIT_KW),
        DiT4DJoint(grid_rows=h, grid_cols=w, t_patch_size=2, **DIT_KW),
        DiT4DFactorized(grid_rows=h, grid_cols=w, t_patch_size=4, **DIT_KW),
    ]:
        params = model.init(jax.random.PRNGKey(1), future, t, past)
        out = model.apply(params, future, t, past)
        assert out.shape == future.shape, type(model).__name__
        assert jnp.all(jnp.isfinite(out)), type(model).__name__


def test_dit_zero_init_final_layer():
    """AdaLN-Zero: output is exactly zero at init (zero-init final layer)."""
    future, t, past = _data(12, 36)
    model = DiT4DFactorized(grid_rows=12, grid_cols=36, t_patch_size=4, **DIT_KW)
    params = model.init(jax.random.PRNGKey(1), future, t, past)
    out = model.apply(params, future, t, past)
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_factory_builds_reference_archs(atc_cfg):
    from crowdmod_tpu.models.factory import build_backbone

    future, t, past = _data(12, 36)
    for arch in ["DDPM-UNet", "DDPM-DiT", "FM-UNet", "FM-DiT"]:
        model = build_backbone(atc_cfg, arch, 3)
        # jit: these are FULL reference-size models; eager per-op dispatch
        # of a 7-12M-param forward dominates this module's wall-clock.
        params = jax.jit(model.init)(jax.random.PRNGKey(0), future, t, past)
        out = jax.jit(model.apply)(params, future, t, past)
        assert out.shape == future.shape, arch


def test_remat_numerical_equivalence():
    """remat=True computes the same function: same param pytree, forward and
    grads equal to float-fusion tolerance (remat regions shift XLA fusion
    boundaries, so exact bit-parity is not guaranteed)."""
    import numpy as np

    future, t, past = _data(8, 12)
    kw = dict(
        out_channels=3, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, True), dropout_rate=0.0,
    )
    for make in [
        lambda r: UNet3D(remat=r, **kw),
        lambda r: DiT4DFactorized(
            grid_rows=8, grid_cols=12, t_patch_size=4, remat=r, **DIT_KW
        ),
    ]:
        base, rm = make(False), make(True)
        params = jax.jit(base.init)(jax.random.PRNGKey(1), future, t, past)
        # Identical param structure: remat params load into the plain model.
        params_rm = jax.jit(rm.init)(jax.random.PRNGKey(1), future, t, past)
        assert jax.tree.structure(params) == jax.tree.structure(params_rm)

        # jit everything: eager per-op dispatch of a whole UNet/DiT forward
        # (+ grad) is the slowest thing this module does on CPU.
        out = jax.jit(base.apply)(params, future, t, past)
        out_rm = jax.jit(rm.apply)(params, future, t, past)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_rm), rtol=1e-3, atol=1e-4
        )

        def loss(model):
            return lambda p: jnp.sum(
                model.apply(p, future, t, past) ** 2
            )

        g = jax.jit(jax.grad(loss(base)))(params)
        g_rm = jax.jit(jax.grad(loss(rm)))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_rm)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )


def test_factory_remat_plumbing(atc_cfg):
    from crowdmod_tpu.models.factory import build_backbone

    cfg = atc_cfg.updated({"TPU": {"REMAT": True}})
    for arch in ["DDPM-UNet", "DDPM-DiT", "FM-DiT"]:
        assert build_backbone(cfg, arch, 3).remat is True, arch
        assert build_backbone(atc_cfg, arch, 3).remat is False, arch
