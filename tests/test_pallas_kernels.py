"""Pallas kernel parity tests, run in interpreter mode on the CPU backend.

Each kernel is checked three ways: (1) interpret-mode kernel output equals the
jnp reference implementation, (2) the jnp reference matches the independent
oracle (flax GroupNorm / einsum attention / composite reverse step), and
(3) gradients flow through the custom-VJP wrappers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from crowdmod_tpu.ops.pallas.attention import (
    attention_reference,
    fused_attention,
)
from crowdmod_tpu.ops.pallas.fused_step import (
    ancestral_update_reference,
    fused_ancestral_update,
)
from crowdmod_tpu.ops.pallas.groupnorm import (
    fused_group_norm,
    group_norm_reference,
)


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------

@pytest.mark.parametrize("sq,sk,dh", [(216, 216, 64), (3, 8, 32)])
def test_attention_interpret_matches_reference(sq, sk, dh):
    b, h = 2, 4
    q, k, v = rand(0, (b, h, sq, dh)), rand(1, (b, h, sk, dh)), rand(2, (b, h, sk, dh))
    ref = attention_reference(q, k, v, 1.0 / dh**0.5)
    out = fused_attention(q, k, v, mode="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attention_grads_flow():
    q, k, v = rand(0, (1, 2, 16, 32)), rand(1, (1, 2, 16, 32)), rand(2, (1, 2, 16, 32))

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mode="interpret") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, 1.0 / 32**0.5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_mha_module_routes_identically():
    """The MHA module output must be the same whatever the kernel mode."""
    import os

    from crowdmod_tpu.ops.attention import MultiHeadAttention

    x = rand(3, (2, 5, 27, 64))
    m = MultiHeadAttention(num_heads=4)
    params = m.init(jax.random.PRNGKey(0), x)
    base = m.apply(params, x)
    os.environ["CROWDMOD_FORCE_PALLAS"] = "interpret"
    try:
        # Guard against a vacuous pass: the flip must actually re-route.
        from crowdmod_tpu.ops.pallas import pallas_mode

        assert pallas_mode("attention") == "interpret"
        fused = m.apply(params, x)
    finally:
        del os.environ["CROWDMOD_FORCE_PALLAS"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)


# --------------------------------------------------------------------------
# GroupNorm
# --------------------------------------------------------------------------

def test_groupnorm_reference_matches_flax():
    x = rand(0, (2, 4, 6, 8, 16))
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    params = gn.init(jax.random.PRNGKey(1), x)
    # Use non-trivial affine params.
    gamma = rand(2, (16,)) * 0.1 + 1.0
    beta = rand(3, (16,)) * 0.1
    params = {"params": {"scale": gamma, "bias": beta}}
    ref_flax = gn.apply(params, x)
    mine = group_norm_reference(x, gamma, beta, 8, 1e-5, silu=False)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref_flax), atol=1e-5)


def test_groupnorm_interpret_matches_reference():
    x = rand(0, (3, 4, 6, 8, 16))
    gamma, beta = jnp.ones((16,)), jnp.zeros((16,))
    for silu in (False, True):
        ref = group_norm_reference(x, gamma, beta, 8, 1e-5, silu)
        out = fused_group_norm(
            x, gamma, beta, num_groups=8, silu=silu, mode="interpret"
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_groupnorm_grads_flow():
    x = rand(0, (2, 4, 4, 8))
    gamma, beta = jnp.ones((8,)) * 1.3, jnp.zeros((8,)) + 0.1

    def loss(x, ga, be, mode):
        return jnp.sum(
            fused_group_norm(x, ga, be, num_groups=4, silu=True, mode=mode) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta, "interpret")
    gr = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta, "off")
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# --------------------------------------------------------------------------
# Fused ancestral update
# --------------------------------------------------------------------------

@pytest.mark.parametrize("sparsity", [False, True])
def test_fused_step_interpret_matches_reference(sparsity):
    x, eps, z = rand(0, (2, 3, 8, 12, 3)), rand(1, (2, 3, 8, 12, 3)), rand(2, (2, 3, 8, 12, 3))
    kw = dict(
        inv_sqrt_alpha=jnp.float32(1.01), beta_over_somab=jnp.float32(0.02),
        sigma=jnp.float32(0.1), lambda_guidance=0.5, sparsity=sparsity,
    )
    ref = ancestral_update_reference(x, eps, z, **kw)
    out = fused_ancestral_update(x, eps, z, mode="interpret", **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ddpm_sampler_unchanged_by_fusion(monkeypatch):
    """ddpm_sample must produce identical trajectories with the fused kernel
    (interpret) and the composite path, under the same key."""
    import os

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.diffusion import ddpm_sample

    sched = linear_schedule(8, scale=0.5)
    denoise = lambda x, t, c: 0.1 * x
    key = jax.random.PRNGKey(7)
    shape = (2, 3, 4, 6, 3)

    base = ddpm_sample(denoise, sched, None, key, shape)
    monkeypatch.setenv("CROWDMOD_FORCE_PALLAS", "interpret")
    from crowdmod_tpu.ops.pallas import pallas_mode

    assert pallas_mode("fused_step") == "interpret"  # flip is live
    fused = ddpm_sample(denoise, sched, None, key, shape)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)


# --------------------------------------------------------------------------
# Conv3D lowerings
# --------------------------------------------------------------------------

def test_conv3d_lowerings_agree():
    from flax import linen as nn

    from crowdmod_tpu.ops.conv3d import Conv3DSame, conv3d_same

    x = rand(0, (2, 5, 6, 9, 8))
    kernel = rand(1, (3, 3, 3, 8, 16)) * 0.1
    direct = conv3d_same(x, kernel, "direct")
    for impl in ("split_t", "fold_t"):
        out = conv3d_same(x, kernel, impl)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(direct), atol=1e-4
        )

    # Module parity vs flax nn.Conv with identical params.
    m_ref = nn.Conv(16, kernel_size=(3, 3, 3), padding="SAME")
    params = {"params": {"kernel": kernel, "bias": rand(2, (16,))}}
    ref = m_ref.apply(params, x)
    for impl in ("direct", "split_t", "fold_t"):
        mine = Conv3DSame(16, impl=impl).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(mine), np.asarray(ref), atol=1e-4
        )


def test_conv3d_grads_agree():
    from crowdmod_tpu.ops.conv3d import conv3d_same

    x = rand(0, (1, 4, 4, 6, 4))
    kernel = rand(1, (3, 3, 3, 4, 4)) * 0.1
    grads = {}
    for impl in ("direct", "split_t", "fold_t"):
        g = jax.grad(
            lambda x, k: jnp.sum(conv3d_same(x, k, impl) ** 2), argnums=(0, 1)
        )(x, kernel)
        grads[impl] = g
    for impl in ("split_t", "fold_t"):
        for a, b in zip(grads[impl], grads["direct"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_conv3d_tapgemm_matches_xla():
    """Tap-packed shift-GEMM conv == XLA direct conv (interpret mode)."""
    from crowdmod_tpu.ops.conv3d import conv3d_same
    from crowdmod_tpu.ops.pallas.conv3d import conv3d_same_tapgemm

    rng = np.random.default_rng(5)
    for cin, cout in [(32, 32), (96, 32), (3, 16)]:
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1
        )
        ref = conv3d_same(x, k, "direct")
        out = conv3d_same_tapgemm(x, k, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"tapgemm conv diverges at {cin}->{cout}",
        )


def test_conv3d_im2col_matches_xla():
    """Weight-resident im2col conv == XLA direct conv (interpret mode), at
    the UNet's narrow-channel shapes including the decoder concat widths."""
    from crowdmod_tpu.ops.conv3d import conv3d_same
    from crowdmod_tpu.ops.pallas.conv3d import conv3d_same_im2col

    rng = np.random.default_rng(3)
    for cin, cout in [(32, 32), (96, 32), (3, 16)]:
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1
        )
        ref = conv3d_same(x, k, "direct")
        out = conv3d_same_im2col(x, k, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"im2col conv diverges at {cin}->{cout}",
        )


def test_conv3d_pallas_impls_differentiable(monkeypatch):
    """CROWDMOD_CONV3D_IMPL=pallas(_tap) must be trainable: the custom VJP
    differentiates through the math-identical direct conv."""
    from crowdmod_tpu.ops import conv3d as mod
    from crowdmod_tpu.ops.pallas import conv3d as pk

    monkeypatch.setattr(
        pk, "conv3d_same_im2col",
        functools.partial(pk.conv3d_same_im2col, interpret=True),
    )
    monkeypatch.setattr(
        pk, "conv3d_same_tapgemm",
        functools.partial(pk.conv3d_same_tapgemm, interpret=True),
    )
    x = rand(0, (1, 4, 4, 6, 4))
    kernel = rand(1, (3, 3, 3, 4, 4)) * 0.1
    ref_out = mod.conv3d_same(x, kernel, "direct")
    ref_g = jax.grad(
        lambda x, k: jnp.sum(mod.conv3d_same(x, k, "direct") ** 2),
        argnums=(0, 1),
    )(x, kernel)
    for impl in ("pallas", "pallas_tap"):
        out = mod.conv3d_same(x, kernel, impl)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-4)
        g = jax.grad(
            lambda x, k: jnp.sum(mod.conv3d_same(x, k, impl) ** 2),
            argnums=(0, 1),
        )(x, kernel)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pallas_mode_rejects_typos(monkeypatch):
    from crowdmod_tpu.ops.pallas import pallas_mode

    monkeypatch.setenv("CROWDMOD_FORCE_PALLAS", "complied")
    with pytest.raises(ValueError, match="CROWDMOD_FORCE_PALLAS"):
        pallas_mode("attention")
    monkeypatch.delenv("CROWDMOD_FORCE_PALLAS")
    monkeypatch.setenv("CROWDMOD_PALLAS_ATTENTION", "on")
    with pytest.raises(ValueError, match="CROWDMOD_PALLAS_ATTENTION"):
        pallas_mode("attention")


def test_groupnorm_rejects_indivisible_channels():
    from crowdmod_tpu.ops.pallas.groupnorm import fused_group_norm

    x = rand(0, (2, 5, 12))
    with pytest.raises(ValueError, match="divisible"):
        fused_group_norm(x, jnp.ones(12), jnp.zeros(12), num_groups=8)


# --------------------------------------------------------------------------
# Weight-stationary fused resblock (ops/pallas/resblock.py)
# --------------------------------------------------------------------------

def _resblock_weights(key, cin, cout):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    n = lambda k, s, sc: jax.random.normal(k, s, jnp.float32) * sc
    w = {
        "gn1_scale": n(ks[0], (cin,), 0.1) + 1.0,
        "gn1_bias": n(ks[1], (cin,), 0.1),
        "w1": n(ks[2], (3, 3, 3, cin, cout), 0.05),
        "b1": n(ks[3], (cout,), 0.1),
        "gn2_scale": n(ks[4], (cout,), 0.1) + 1.0,
        "gn2_bias": n(ks[5], (cout,), 0.1),
        "w2": n(ks[6], (3, 3, 3, cout, cout), 0.05),
        "b2": n(ks[7], (cout,), 0.1),
    }
    if cin != cout:
        w["w_skip"] = n(ks[8], (1, 1, 1, cin, cout), 0.1)
        w["b_skip"] = n(ks[9], (cout,), 0.1)
    return w


@pytest.mark.parametrize(
    "cin,cout,vol",
    [
        (32, 32, (4, 6, 8)),    # identity skip
        (96, 32, (4, 6, 8)),    # decoder concat + 1x1 skip-match
        (64, 32, (2, 3, 9)),    # smallest level geometry (wrap-safety edge)
        (32, 64, (4, 6, 8)),    # widening block
    ],
)
def test_resblock_interpret_matches_reference(cin, cout, vol):
    from crowdmod_tpu.ops.pallas.resblock import (
        fused_resblock,
        resblock_reference,
    )

    t, h, w_ = vol
    x = rand(cin + cout, (2, t, h, w_, cin))
    temb = rand(1, (2, cout))
    w = _resblock_weights(2, cin, cout)
    ref = resblock_reference(x, temb, w)
    out = fused_resblock(x, temb, w, mode="interpret")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=2e-5 * float(jnp.max(jnp.abs(ref))),
    )


def test_resblock_reference_matches_module():
    """The jnp oracle must equal the real ResnetBlock3D.apply, so the fused
    kernel is transitively pinned to the model the checkpoints were trained
    with (deterministic path; Dropout3d is identity there)."""
    from crowdmod_tpu.models.backbones.unet3d import ResnetBlock3D
    from crowdmod_tpu.ops.pallas.resblock import resblock_reference

    cin, cout = 32, 16
    x = rand(0, (2, 3, 4, 6, cin))
    temb = rand(1, (2, 24))
    mod = ResnetBlock3D(out_channels=cout, dropout_rate=0.5)
    params = mod.init(jax.random.PRNGKey(0), x, temb)["params"]
    ref = mod.apply({"params": params}, x, temb, True)

    p = params
    w = {
        "gn1_scale": p["GroupNormSiLU_0"]["scale"],
        "gn1_bias": p["GroupNormSiLU_0"]["bias"],
        "w1": p["conv1"]["kernel"],
        "b1": p["conv1"]["bias"],
        "gn2_scale": p["GroupNormSiLU_1"]["scale"],
        "gn2_bias": p["GroupNormSiLU_1"]["bias"],
        "w2": p["conv2"]["kernel"],
        "b2": p["conv2"]["bias"],
        "w_skip": p["match_input"]["kernel"],
        "b_skip": p["match_input"]["bias"],
    }
    temb_proj = (
        nn.silu(temb) @ p["time_dense"]["kernel"] + p["time_dense"]["bias"]
    )
    out = resblock_reference(x, temb_proj, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_resblock_gradients_flow():
    from crowdmod_tpu.ops.pallas.resblock import fused_resblock

    x = rand(0, (1, 2, 4, 6, 32))
    temb = rand(1, (1, 32))
    w = _resblock_weights(2, 32, 32)
    loss = lambda x, t, w: jnp.sum(
        fused_resblock(x, t, w, mode="interpret") ** 2
    )
    gx, gt, gw = jax.grad(loss, argnums=(0, 1, 2))(x, temb, w)
    assert bool(jnp.isfinite(gx).all()) and float(jnp.abs(gx).max()) > 0
    assert bool(jnp.isfinite(gt).all())
    for leaf in jax.tree.leaves(gw):
        assert bool(jnp.isfinite(leaf).all())


def test_resblock_off_mode_and_indivisible_fallback():
    """mode='off' and non-multiple-of-8 channel counts route to the jnp
    reference (identical results by construction)."""
    from crowdmod_tpu.ops.pallas.resblock import (
        fused_resblock,
        resblock_reference,
    )

    x = rand(0, (1, 2, 4, 6, 32))
    temb = rand(1, (1, 32))
    w = _resblock_weights(2, 32, 32)
    np.testing.assert_array_equal(
        np.asarray(fused_resblock(x, temb, w, mode="off")),
        np.asarray(resblock_reference(x, temb, w)),
    )


def test_fused_unet_apply_matches_model():
    """The interceptor-routed UNet forward (level-0 resblocks through the
    fused kernel, everything else untouched) equals plain model.apply."""
    from crowdmod_tpu.models.backbones.fused_apply import (
        MIN_FUSED_VOLUME,
        fused_unet_apply,
    )
    from crowdmod_tpu.models.backbones.unet3d import UNet3D

    t, h, w_, c = 8, 12, 12, 3  # level-0 volume 1152 >= MIN_FUSED_VOLUME
    assert t * h * w_ >= MIN_FUSED_VOLUME
    model = UNet3D(
        out_channels=c, base_channels=8, base_channels_multiples=(1, 2),
        apply_attention=(False, True), dropout_rate=0.2,
    )
    past = rand(0, (2, 5, h, w_, c))
    future = rand(1, (2, 3, h, w_, c))
    tt = jnp.array([3.0, 7.0])
    variables = model.init(jax.random.PRNGKey(0), future, tt, past)
    ref = model.apply(variables, future, tt, past, deterministic=True)
    out = fused_unet_apply(model, variables, future, tt, past,
                           mode="interpret")
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=3e-5 * float(jnp.max(jnp.abs(ref))),
    )
    # With mode='off' the interceptor routes to the jnp reference — still
    # equal, proving the fall-through plumbing.
    off = fused_unet_apply(model, variables, future, tt, past, mode="off")
    np.testing.assert_allclose(
        np.asarray(off), np.asarray(ref),
        atol=3e-5 * float(jnp.max(jnp.abs(ref))),
    )
