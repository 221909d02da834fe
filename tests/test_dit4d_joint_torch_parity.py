"""DiT4DJoint (V3: partial tube + joint attention) parity vs reference."""

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

from tests.test_dit_torch_parity import _dense, _mha

C = 3
H, W = 8, 12
P, F = 5, 3
PATCH, T_PATCH = 4, 2
HIDDEN, DEPTH, HEADS = 64, 2, 4
T_MAX = 32


def test_dit4d_joint_forward_parity():
    from models.backbones.DiT4D_V3 import DiT4D_V3

    torch.manual_seed(0)
    ref = DiT4D_V3(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        past_len=P, future_len=F, t_patch_size=T_PATCH, patch_size=PATCH,
        hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        dropout_rate=0.0, time_multiple=4, T_max=T_MAX,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)

    from crowdmod_tpu.models.backbones.dit import DiT4DJoint

    ours = DiT4DJoint(
        out_channels=C, grid_rows=H, grid_cols=W, past_len=P, future_len=F,
        patch_size=PATCH, t_patch_size=T_PATCH, hidden_size=HIDDEN,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, dropout_rate=0.0,
        time_multiple=4, t_max=T_MAX,
    )

    pe = ref.patch_embed.proj  # Conv3d (D, C, pt, p, p)
    patch_kernel = jnp.asarray(
        pe.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    )
    idx = np.arange(T_PATCH * C * PATCH * PATCH).reshape(T_PATCH, C, PATCH, PATCH)
    perm = idx.transpose(0, 2, 3, 1).reshape(-1)
    fin_w = ref.final_layer.linear.weight.detach().numpy()
    fin_b = ref.final_layer.linear.bias.detach().numpy()

    block = lambda b: {
        "AdaLNModulation_0": {"Dense_0": _dense(b.adaLN_modulation[1])},
        "MultiHeadAttention_0": _mha(b.attn, HIDDEN),
        "Mlp_0": {"Dense_0": _dense(b.mlp[0]), "Dense_1": _dense(b.mlp[3])},
    }
    params = {"params": {
        "time_emb": {
            "expand": _dense(ref.dif_time_embeddings.time_blocks[1]),
            "project": _dense(ref.dif_time_embeddings.time_blocks[3]),
        },
        "time_proj": _dense(ref.time_proj[0]),
        "patch_embed": {"Conv_0": {
            "kernel": patch_kernel,
            "bias": jnp.asarray(pe.bias.detach().numpy()),
        }},
        "spatial_pos_embed": jnp.asarray(
            ref.spatial_pos_embed.detach().numpy())[:, None],
        "temporal_pos_embed": jnp.asarray(
            ref.temporal_pos_embed.detach().numpy())[:, :, None],
        "final": {
            "AdaLNModulation_0": {
                "Dense_0": _dense(ref.final_layer.adaLN_modulation[1])
            },
            "Dense_0": {"kernel": jnp.asarray(fin_w.T[:, perm]),
                        "bias": jnp.asarray(fin_b[perm])},
        },
        **{f"block_{i}": block(b) for i, b in enumerate(ref.blocks)},
    }}

    b = 2
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, H, W, P)).astype(np.float32)
    future_ref = rng.normal(size=(b, C, H, W, F)).astype(np.float32)
    t = np.array([9, 250])
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future_ref), torch.tensor(t), torch.tensor(past_ref)
        ).numpy()

    init = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, F, H, W, C)), jnp.zeros((b,)), jnp.zeros((b, P, H, W, C)),
    )
    ip = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(init)}
    mp = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(params)}
    assert ip == mp, (
        f"missing {set(ip) - set(mp)} extra {set(mp) - set(ip)} "
        f"shape {[k for k in ip if k in mp and ip[k] != mp[k]]}"
    )

    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = ours.apply(
        params, to_native(future_ref), jnp.asarray(t), to_native(past_ref)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_ref, (0, 4, 2, 3, 1)), atol=2e-4,
        err_msg="DiT4DJoint diverges from reference DiT4D_V3",
    )
