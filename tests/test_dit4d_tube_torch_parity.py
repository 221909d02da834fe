"""DiT4DTube (V2: full temporal tube) parity vs reference DiT4D.

The reference's FinalLayer emits only the F future frames per token
(DiT4D.py:119-137) while our tube emits all T frames and slices — mapping
zero-pads the past-frame rows of our final projection, making the sliced
outputs identical.  The reference also has no temporal positional embedding
(one temporal slot); our temporal embed maps to zeros.
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

from tests.test_dit_torch_parity import _dense, _mha

C = 3
H, W = 8, 12
P, F = 5, 3
T = P + F
PATCH = 4
HIDDEN, DEPTH, HEADS = 64, 2, 4


def test_dit4d_tube_forward_parity():
    from models.backbones.DiT4D import DiT4D

    torch.manual_seed(0)
    ref = DiT4D(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        past_len=P, future_len=F, patch_size=PATCH, hidden_size=HIDDEN,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, dropout_rate=0.0,
        time_multiple=4,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)

    from crowdmod_tpu.models.backbones.dit import DiT4DTube

    ours = DiT4DTube.make(
        past_len=P, future_len=F, out_channels=C, grid_rows=H, grid_cols=W,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=T,
    )

    # Tube conv: torch Conv3d (D, C, T, p, p) → flax (T, p, p, C, D).
    pe = ref.patch_embed.proj
    patch_kernel = jnp.asarray(
        pe.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    )

    # Final projection: theirs (hidden → F·C·p·p) features (F, C, p, p);
    # ours (hidden → T·p·p·C) features (tt, ph, pw, cc).  Past rows zero,
    # future rows gathered from theirs.
    fin_w = ref.final_layer.linear.weight.detach().numpy().T  # (hidden, FCpp)
    fin_b = ref.final_layer.linear.bias.detach().numpy()
    ours_w = np.zeros((HIDDEN, T * PATCH * PATCH * C), np.float32)
    ours_b = np.zeros((T * PATCH * PATCH * C,), np.float32)
    theirs_idx = np.arange(F * C * PATCH * PATCH).reshape(F, C, PATCH, PATCH)
    ours_idx = np.arange(T * PATCH * PATCH * C).reshape(T, PATCH, PATCH, C)
    for ff in range(F):
        src = theirs_idx[ff].transpose(1, 2, 0).reshape(-1)   # (p, p, C) flat
        dst = ours_idx[P + ff].reshape(-1)
        ours_w[:, dst] = fin_w[:, src]
        ours_b[dst] = fin_b[src]

    block = lambda b: {
        "AdaLNModulation_0": {"Dense_0": _dense(b.adaLN_modulation[1])},
        "MultiHeadAttention_0": _mha(b.attn, HIDDEN),
        "Mlp_0": {"Dense_0": _dense(b.mlp[0]), "Dense_1": _dense(b.mlp[3])},
    }
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
            ref.spatial_pos_embed.detach().numpy())[:, None],
        # Reference V2 has no temporal embedding (single slot) → zeros.
        "temporal_pos_embed": jnp.zeros((1, T // T, 1, HIDDEN)),
        "final": {
            "AdaLNModulation_0": {
                "Dense_0": _dense(ref.final_layer.adaLN_modulation[1])
            },
            "Dense_0": {"kernel": jnp.asarray(ours_w),
                        "bias": jnp.asarray(ours_b)},
        },
        **{f"block_{i}": block(b) for i, b in enumerate(ref.blocks)},
    }}

    b = 2
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, H, W, P)).astype(np.float32)
    future_ref = rng.normal(size=(b, C, H, W, F)).astype(np.float32)
    t = np.array([3, 77])
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
        err_msg="DiT4DTube diverges from reference DiT4D (V2)",
    )
