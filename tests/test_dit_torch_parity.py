"""DiT4DFactorized forward parity vs the reference torch DiT4D_V4.

Same methodology as tests/test_unet_torch_parity.py, for the flagship
backbone: build the reference model (imported at runtime as an oracle), map
its weights into our flax module — including the patch-conv layout transpose
and the FinalLayer feature-order permutation — and require matching outputs
on identical inputs.
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

C = 3
H, W = 8, 12
P, F = 5, 3
PATCH, T_PATCH = 4, 2
HIDDEN, DEPTH, HEADS = 64, 2, 4
T_MAX = 32


def _dense(t):
    return {"kernel": jnp.asarray(t.weight.detach().numpy().T),
            "bias": jnp.asarray(t.bias.detach().numpy())}


def _mha(mhsa, dim):
    w = mhsa.in_proj_weight.detach().numpy()
    b = mhsa.in_proj_bias.detach().numpy()
    return {
        "query": {"kernel": jnp.asarray(w[:dim].T), "bias": jnp.asarray(b[:dim])},
        "key": {"kernel": jnp.asarray(w[dim:2 * dim].T),
                "bias": jnp.asarray(b[dim:2 * dim])},
        "value": {"kernel": jnp.asarray(w[2 * dim:].T),
                  "bias": jnp.asarray(b[2 * dim:])},
        "out": {"kernel": jnp.asarray(mhsa.out_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(mhsa.out_proj.bias.detach().numpy())},
    }


def _block(block):
    return {
        "AdaLNModulation_0": {"Dense_0": _dense(block.adaLN_modulation[1])},
        "spatial_attn": _mha(block.spatial_attn, HIDDEN),
        "temporal_attn": _mha(block.temporal_attn, HIDDEN),
        "Mlp_0": {"Dense_0": _dense(block.mlp[0]),
                  "Dense_1": _dense(block.mlp[3])},
    }


def _final_perm():
    """Their token features are (pt, C, p, p); ours (pt, p, p, C)."""
    idx = np.arange(T_PATCH * C * PATCH * PATCH).reshape(T_PATCH, C, PATCH, PATCH)
    return idx.transpose(0, 2, 3, 1).reshape(-1)  # ours[k] = theirs[perm[k]]


def map_params(ref) -> dict:
    pe = ref.patch_embed.proj  # Conv3d weight (D_out, C, pt, p, p)
    patch_kernel = jnp.asarray(
        pe.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    )
    perm = _final_perm()
    fin_w = ref.final_layer.linear.weight.detach().numpy()  # (ptCpp, hidden)
    fin_b = ref.final_layer.linear.bias.detach().numpy()
    params = {
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
            ref.spatial_pos_embed.detach().numpy()
        )[:, None],  # (1, N_s, D) → (1, 1, N_s, D)
        "temporal_pos_embed": jnp.asarray(
            ref.temporal_pos_embed.detach().numpy()
        )[:, :, None],  # (1, slots, D) → (1, slots, 1, D)
        "final": {
            "AdaLNModulation_0": {
                "Dense_0": _dense(ref.final_layer.adaLN_modulation[1])
            },
            "Dense_0": {
                "kernel": jnp.asarray(fin_w.T[:, perm]),
                "bias": jnp.asarray(fin_b[perm]),
            },
        },
    }
    for i, blk in enumerate(ref.blocks):
        params[f"block_{i}"] = _block(blk)
    return {"params": params}


def test_dit_factorized_forward_parity():
    from models.backbones.DiT4D_V4 import DiT4D_V4

    torch.manual_seed(0)
    ref = DiT4D_V4(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        past_len=P, future_len=F, t_patch_size=T_PATCH, patch_size=PATCH,
        hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        dropout_rate=0.0, time_multiple=4, T_max=T_MAX,
    ).eval()
    # The reference's final-layer / adaLN zero-inits are overwritten by its
    # own _init_weights xavier pass, but re-randomize the final bias so the
    # output isn't dominated by zeros.
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)

    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized

    ours = DiT4DFactorized(
        out_channels=C, grid_rows=H, grid_cols=W, past_len=P, future_len=F,
        patch_size=PATCH, t_patch_size=T_PATCH, hidden_size=HIDDEN,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, dropout_rate=0.0,
        time_multiple=4, t_max=T_MAX,
    )

    b = 2
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, H, W, P)).astype(np.float32)
    future_ref = rng.normal(size=(b, C, H, W, F)).astype(np.float32)
    t = np.array([11, 311])

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future_ref), torch.tensor(t), torch.tensor(past_ref)
        ).numpy()  # (B, C, H, W, F)

    params = map_params(ref)
    init = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, F, H, W, C)), jnp.zeros((b,)), jnp.zeros((b, P, H, W, C)),
    )
    init_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                  jax.tree_util.tree_leaves_with_path(init)}
    mapped_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_leaves_with_path(params)}
    assert init_paths == mapped_paths, (
        f"missing: {set(init_paths) - set(mapped_paths)}\n"
        f"extra: {set(mapped_paths) - set(init_paths)}\n"
        f"shape diffs: "
        f"{ {k: (init_paths.get(k), mapped_paths.get(k)) for k in init_paths if mapped_paths.get(k) != init_paths.get(k)} }"
    )

    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = ours.apply(
        params, to_native(future_ref), jnp.asarray(t), to_native(past_ref)
    )
    out_ref_native = np.transpose(out_ref, (0, 4, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out), out_ref_native, atol=2e-4,
        err_msg="DiT4DFactorized diverges from reference DiT4D_V4",
    )
