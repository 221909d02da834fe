"""DiT2D (FM backbone) forward parity vs the reference torch DiT2D."""

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

from tests.test_dit_torch_parity import _dense, _mha  # reuse weight mappers

C = 3
H, W = 8, 12
P, F = 5, 3
PATCH = 4
HIDDEN, DEPTH, HEADS = 64, 2, 4
T_MAX = 8


def _block(block):
    return {
        "AdaLNModulation_0": {"Dense_0": _dense(block.adaLN_modulation[1])},
        "MultiHeadAttention_0": _mha(block.attn, HIDDEN),
        "Mlp_0": {"Dense_0": _dense(block.mlp[0]),
                  "Dense_1": _dense(block.mlp[3])},
    }


def test_dit2d_forward_parity():
    from models.backbones.DiT2D import DiT2D as RefDiT2D

    torch.manual_seed(0)
    ref = RefDiT2D(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=T_MAX,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)

    from crowdmod_tpu.models.backbones.dit import DiT2D

    ours = DiT2D(
        out_channels=C, grid_rows=H, grid_cols=W, past_len=P, future_len=F,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=T_MAX,
    )

    # Per-frame Conv2d (D, C, p, p) → our tube conv (1, p, p, C, D).
    pe = ref.patch_embed.proj
    patch_kernel = jnp.asarray(
        pe.weight.detach().numpy().transpose(2, 3, 1, 0)
    )[None]
    # Their token features are (C, p, p); ours (1, p, p, C) → permute.
    idx = np.arange(C * PATCH * PATCH).reshape(C, PATCH, PATCH)
    perm = idx.transpose(1, 2, 0).reshape(-1)
    fin_w = ref.final_layer.linear.weight.detach().numpy()
    fin_b = ref.final_layer.linear.bias.detach().numpy()

    params = {"params": {
        "time_emb": {
            "expand": _dense(ref.time_embeddings.time_blocks[1]),
            "project": _dense(ref.time_embeddings.time_blocks[3]),
        },
        "time_proj": _dense(ref.time_proj[0]),
        "patch_embed": {"Conv_0": {
            "kernel": patch_kernel,
            "bias": jnp.asarray(pe.bias.detach().numpy()),
        }},
        "spatial_pos_embed": jnp.asarray(
            ref.spatial_pos_embed.detach().numpy()
        )[:, None],
        "temporal_pos_embed": jnp.asarray(
            ref.temporal_pos_embed.detach().numpy()
        )[:, :, None],
        "final": {
            "AdaLNModulation_0": {
                "Dense_0": _dense(ref.final_layer.adaLN_modulation[1])
            },
            "Dense_0": {
                "kernel": jnp.asarray(fin_w.T[:, perm]),
                "bias": jnp.asarray(fin_b[perm]),
            },
        },
        **{f"block_{i}": _block(b) for i, b in enumerate(ref.blocks)},
    }}

    b = 2
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, H, W, P)).astype(np.float32)
    future_ref = rng.normal(size=(b, C, H, W, F)).astype(np.float32)
    t = np.array([5, 123])
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
    out_ref_native = np.transpose(out_ref, (0, 4, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out), out_ref_native, atol=2e-4,
        err_msg="DiT2D diverges from reference",
    )
