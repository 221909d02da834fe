"""UNet3D forward parity vs the reference torch UNet with mapped weights.

The SURVEY §7 "numerical parity" hard part: matching torch
GroupNorm/Conv3d("same")/MultiheadAttention semantics.  This test builds the
reference torch UNet (imported at runtime from the mounted repo as an
oracle), maps its randomly-initialized weights into our flax UNet3D, and
checks the two forwards agree on identical inputs — across layouts
(their (B, C, H, W, T) vs our (B, T, H, W, C)).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

BASE = 16
MULT = (1, 2)
ATTN = (False, True)
RES_BLOCKS = 1
C = 3
TEMB = BASE * 4


def _conv_w(t):  # torch (O, I, kh, kw, kl) → flax (kl, kh, kw, I, O)
    return jnp.asarray(t.detach().numpy().transpose(4, 2, 3, 1, 0))


def _dense_w(t):  # torch (O, I) → flax (I, O)
    return jnp.asarray(t.detach().numpy().T)


def _v(t):
    return jnp.asarray(t.detach().numpy())


def _map_conv(mod):
    return {"kernel": _conv_w(mod.weight), "bias": _v(mod.bias)}


def _map_gn(mod):
    return {"scale": _v(mod.weight), "bias": _v(mod.bias)}


def _map_attention(mhsa, dim):
    w = mhsa.in_proj_weight
    b = mhsa.in_proj_bias
    return {
        "query": {"kernel": _dense_w(w[:dim]), "bias": _v(b[:dim])},
        "key": {"kernel": _dense_w(w[dim:2 * dim]), "bias": _v(b[dim:2 * dim])},
        "value": {"kernel": _dense_w(w[2 * dim:]), "bias": _v(b[2 * dim:])},
        "out": {"kernel": _dense_w(mhsa.out_proj.weight),
                "bias": _v(mhsa.out_proj.bias)},
    }


def _map_resblock(block):
    out = {
        "GroupNormSiLU_0": _map_gn(block.normalize_1),
        "conv1": _map_conv(block.conv_1),
        "time_dense": {"kernel": _dense_w(block.dense_1.weight),
                       "bias": _v(block.dense_1.bias)},
        "GroupNormSiLU_1": _map_gn(block.normalize_2),
        "conv2": _map_conv(block.conv_2),
    }
    if not isinstance(block.match_input, torch.nn.Identity):
        out["match_input"] = _map_conv(block.match_input)
    if not isinstance(block.attention, torch.nn.Identity):
        a = block.attention
        out["SpatialAttentionBlock_0"] = {
            "GroupNormSiLU_0": _map_gn(a.group_norm),
            "MultiHeadAttention_0": _map_attention(a.mhsa, a.channels),
        }
    return out


def build_models():
    from models.backbones.unet import UNet

    torch.manual_seed(0)
    ref = UNet(
        input_channels=C, output_channels=C, num_res_blocks=RES_BLOCKS,
        base_channels=BASE, base_channels_multiples=list(MULT),
        apply_attention=list(ATTN), dropout_rate=0.0, time_multiple=4,
        condition="Past",
    ).eval()

    from crowdmod_tpu.models.backbones import UNet3D

    ours = UNet3D(
        out_channels=C, num_res_blocks=RES_BLOCKS, base_channels=BASE,
        base_channels_multiples=MULT, apply_attention=ATTN,
        dropout_rate=0.0, time_multiple=4, condition="Past",
    )
    return ref, ours


def map_params(ref) -> dict:
    """Reference torch module tree → our flax param tree."""
    params = {
        "TimestepEmbedding_0": {
            "expand": {"kernel": _dense_w(ref.time_embeddings.time_blocks[1].weight),
                       "bias": _v(ref.time_embeddings.time_blocks[1].bias)},
            "project": {"kernel": _dense_w(ref.time_embeddings.time_blocks[3].weight),
                        "bias": _v(ref.time_embeddings.time_blocks[3].bias)},
        },
        "first": _map_conv(ref.first),
    }
    # Encoder list interleaves ResnetBlocks and DownSamples in our exact
    # naming order.
    from models.backbones.layers import DownSample, ResnetBlock, UpSample

    level, i = 0, 0
    for layer in ref.encoder_blocks:
        if isinstance(layer, ResnetBlock):
            params[f"enc_{level}_{i}"] = _map_resblock(layer)
            i += 1
            if i == RES_BLOCKS:
                pass
        else:  # DownSample
            params[f"down_{level}"] = {"Conv_0": _map_conv(layer.downsample)}
            level, i = level + 1, 0
        if i == RES_BLOCKS and level == len(MULT) - 1 and isinstance(layer, ResnetBlock):
            pass
    params["mid_0"] = _map_resblock(ref.bottleneck_blocks[0])
    params["mid_1"] = _map_resblock(ref.bottleneck_blocks[1])

    level = len(MULT) - 1
    i = 0
    for layer in ref.decoder_blocks:
        if isinstance(layer, ResnetBlock):
            params[f"dec_{level}_{i}"] = _map_resblock(layer)
            i += 1
        else:  # UpSample
            params[f"up_{level}"] = {
                "Conv3DSame_0": _map_conv(layer.upsample[1])
            }
            level, i = level - 1, 0
    params["final_norm"] = _map_gn(ref.final[0])
    params["final_conv"] = _map_conv(ref.final[2])
    return {"params": params}


def test_unet_forward_parity():
    ref, ours = build_models()

    b, p, f, h, w = 2, 5, 3, 8, 12
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, h, w, p)).astype(np.float32)
    future_ref = rng.normal(size=(b, C, h, w, f)).astype(np.float32)
    t = np.array([7, 42])

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future_ref), torch.tensor(t), torch.tensor(past_ref)
        ).numpy()  # (B, C, H, W, F)

    params = map_params(ref)
    # Check the mapped tree matches the initialized structure exactly.
    init = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, f, h, w, C)), jnp.zeros((b,)), jnp.zeros((b, p, h, w, C)),
    )
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_leaves_with_path(init)}
    mapped_paths = {jax.tree_util.keystr(k) for k, _ in
                    jax.tree_util.tree_leaves_with_path(params)}
    assert init_paths == mapped_paths, (
        f"missing: {init_paths - mapped_paths}\n"
        f"extra: {mapped_paths - init_paths}"
    )

    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = ours.apply(
        params, to_native(future_ref), jnp.asarray(t), to_native(past_ref)
    )
    out_ref_native = np.transpose(out_ref, (0, 4, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out), out_ref_native, atol=2e-4,
        err_msg="UNet3D forward diverges from reference torch UNet",
    )
