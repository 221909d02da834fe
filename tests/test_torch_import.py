"""Checkpoint importer: reference torch .pt files → our param trees.

Two layers of proof:

* where a parity test exposes its attribute-driven mapper (UNet, factorized
  DiT, ConvRNN forecaster), the state_dict-driven import must reproduce it
  leaf-for-leaf (those mappers are themselves forward-parity-proven);
* for the remaining DiT variants (V1/V2/V3) the imported weights must
  reproduce the reference torch forward directly;
* plus the CLI round trip: reference ``torch.save`` file →
  ``crowdmod import-checkpoint`` → ``Trainer.load`` → forward parity.
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

from crowdmod_tpu.compat import (  # noqa: E402
    detect_backbone,
    import_torch_checkpoint,
    load_torch_state_dict,
    verify_tree_matches,
)


def _save(ref, tmp_path, name="ref.pt"):
    """Write the reference checkpoint format (utils/utils.py:140-147)."""
    path = str(tmp_path / name)
    torch.save({"opt": {}, "model": ref.state_dict()}, path)
    return path


def _assert_trees_equal(imported, expected):
    got = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
           jax.tree_util.tree_leaves_with_path(imported)}
    want = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_leaves_with_path(expected)}
    assert set(got) == set(want), (
        f"missing {set(want) - set(got)} extra {set(got) - set(want)}"
    )
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


# ---------------------------------------------------------------------------
# leaf-exact vs the forward-parity-proven attribute mappers

def test_unet_import_matches_parity_mapper(tmp_path):
    from tests.test_unet_torch_parity import build_models, map_params

    ref, _ = build_models()
    imported = import_torch_checkpoint(_save(ref, tmp_path), arch="DDPM-UNet")
    _assert_trees_equal(imported, map_params(ref))


def test_unet_import_three_levels_with_attention(tmp_path):
    """Deeper interleave than the parity fixture: 3 resolutions, 2 res
    blocks, mixed attention — the structural walk must still recover
    enc/down/dec/up naming purely from the keys."""
    from models.backbones.unet import UNet as RefUNet

    from crowdmod_tpu.models.backbones import UNet3D

    torch.manual_seed(1)
    ref = RefUNet(
        input_channels=3, output_channels=3, num_res_blocks=2,
        base_channels=8, base_channels_multiples=[1, 2, 4],
        apply_attention=[False, True, False], dropout_rate=0.0,
        time_multiple=4, condition="Past",
    ).eval()
    imported = import_torch_checkpoint(_save(ref, tmp_path), arch="DDPM-UNet")
    ours = UNet3D(
        out_channels=3, num_res_blocks=2, base_channels=8,
        base_channels_multiples=(1, 2, 4), apply_attention=(False, True, False),
        dropout_rate=0.0, time_multiple=4, condition="Past",
    )
    b, p, f = 2, 5, 3
    h, w = 8, 12  # two halvings
    init = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, f, h, w, 3)), jnp.zeros((b,)), jnp.zeros((b, p, h, w, 3)),
    )
    verify_tree_matches(imported, init)
    rng = np.random.default_rng(2)
    past = rng.normal(size=(b, 3, h, w, p)).astype(np.float32)
    future = rng.normal(size=(b, 3, h, w, f)).astype(np.float32)
    t = np.array([1, 3])
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future), torch.tensor(t), torch.tensor(past)
        ).numpy()
    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = ours.apply(
        jax.tree.map(jnp.asarray, imported),
        to_native(future), jnp.asarray(t), to_native(past),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_ref, (0, 4, 2, 3, 1)), atol=2e-4
    )


def test_dit_factorized_import_matches_parity_mapper(tmp_path):
    import tests.test_dit_torch_parity as par
    from models.backbones.DiT4D_V4 import DiT4D_V4

    torch.manual_seed(0)
    ref = DiT4D_V4(
        input_channels=par.C, output_channels=par.C,
        grid_rows=par.H, grid_cols=par.W, past_len=par.P, future_len=par.F,
        t_patch_size=par.T_PATCH, patch_size=par.PATCH,
        hidden_size=par.HIDDEN, depth=par.DEPTH, num_heads=par.HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, T_max=par.T_MAX,
    ).eval()
    imported = import_torch_checkpoint(_save(ref, tmp_path), arch="DDPM-DiT")
    _assert_trees_equal(imported, par.map_params(ref))


def test_convrnn_import_matches_parity_mapper(tmp_path):
    import tests.test_fm_convrnn_protocol_parity as par
    from models.convRNN.convGRUCell import ConvGRUCell as RefGRU
    from models.convRNN.forecaster import Forecaster as RefForecaster

    torch.manual_seed(0)
    ref = RefForecaster(
        input_size=(8, 12), input_channels=par.MPROPS_CONVRNN,
        enc_hidden_channels=par.ENC_CH, forc_hidden_channels=par.FORC_CH,
        enc_kernels=par.ENC_K, forc_kernels=par.FORC_K,
        device="cpu", cell_class=RefGRU, bias=False,
    ).eval()
    imported = import_torch_checkpoint(_save(ref, tmp_path), arch="ConvRNN")
    _assert_trees_equal(imported, par._map_forecaster(ref))


# ---------------------------------------------------------------------------
# forward parity through the import path (DiT variants without an
# importable attribute mapper)

C, H, W, P, F = 3, 8, 12, 5, 3
HIDDEN, DEPTH, HEADS, PATCH = 64, 2, 4, 4


def _forward_parity(ref, ours, imported, t_vals):
    b = 2
    rng = np.random.default_rng(0)
    past = rng.normal(size=(b, C, H, W, P)).astype(np.float32)
    future = rng.normal(size=(b, C, H, W, F)).astype(np.float32)
    t = np.asarray(t_vals)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future), torch.tensor(t), torch.tensor(past)
        ).numpy()

    init = ours.init(
        jax.random.PRNGKey(0),
        jnp.zeros((b, F, H, W, C)), jnp.zeros((b,)), jnp.zeros((b, P, H, W, C)),
    )
    verify_tree_matches(imported, init)
    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = ours.apply(
        jax.tree.map(jnp.asarray, imported),
        to_native(future), jnp.asarray(t), to_native(past),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_ref, (0, 4, 2, 3, 1)), atol=2e-4
    )


def test_dit2d_import_forward_parity(tmp_path):
    from models.backbones.DiT2D import DiT2D as RefDiT2D

    from crowdmod_tpu.models.backbones.dit import DiT2D

    torch.manual_seed(0)
    ref = RefDiT2D(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=8,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)
    ours = DiT2D(
        out_channels=C, grid_rows=H, grid_cols=W, past_len=P, future_len=F,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=8,
    )
    imported = import_torch_checkpoint(_save(ref, tmp_path), arch="FM-DiT")
    _forward_parity(ref, ours, imported, [5, 7])


def test_dit4d_tube_import_forward_parity(tmp_path):
    from models.backbones.DiT4D import DiT4D

    from crowdmod_tpu.models.backbones.dit import DiT4DTube

    torch.manual_seed(0)
    ref = DiT4D(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        past_len=P, future_len=F, patch_size=PATCH, hidden_size=HIDDEN,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, dropout_rate=0.0,
        time_multiple=4,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)
    ours = DiT4DTube.make(
        past_len=P, future_len=F, out_channels=C, grid_rows=H, grid_cols=W,
        patch_size=PATCH, hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
        mlp_ratio=4.0, dropout_rate=0.0, time_multiple=4, t_max=P + F,
    )
    imported = import_torch_checkpoint(_save(ref, tmp_path))
    _forward_parity(ref, ours, imported, [1, 6])


def test_dit4d_joint_import_forward_parity(tmp_path):
    from models.backbones.DiT4D_V3 import DiT4D_V3

    from crowdmod_tpu.models.backbones.dit import DiT4DJoint

    torch.manual_seed(0)
    ref = DiT4D_V3(
        input_channels=C, output_channels=C, grid_rows=H, grid_cols=W,
        past_len=P, future_len=F, t_patch_size=2, patch_size=PATCH,
        hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        dropout_rate=0.0, time_multiple=4, T_max=16,
    ).eval()
    torch.nn.init.normal_(ref.final_layer.linear.bias, std=0.1)
    torch.nn.init.xavier_uniform_(ref.final_layer.linear.weight)
    ours = DiT4DJoint(
        out_channels=C, grid_rows=H, grid_cols=W, past_len=P, future_len=F,
        patch_size=PATCH, t_patch_size=2, hidden_size=HIDDEN,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, dropout_rate=0.0,
        time_multiple=4, t_max=16,
    )
    imported = import_torch_checkpoint(_save(ref, tmp_path))
    _forward_parity(ref, ours, imported, [9, 14])


# ---------------------------------------------------------------------------
# guardrails

def test_detection_and_arch_guard(tmp_path):
    from tests.test_unet_torch_parity import build_models

    ref, _ = build_models()
    path = _save(ref, tmp_path)
    assert detect_backbone(load_torch_state_dict(path)) == "unet3d"
    with pytest.raises(ValueError, match="expects"):
        import_torch_checkpoint(path, arch="DDPM-DiT")
    with pytest.raises(ValueError, match="unknown arch"):
        import_torch_checkpoint(path, arch="DDPM-Mamba")


def test_unconsumed_keys_raise(tmp_path):
    from tests.test_unet_torch_parity import build_models

    ref, _ = build_models()
    sd = ref.state_dict()
    sd["mystery.extra.weight"] = torch.zeros(3)
    path = str(tmp_path / "forked.pt")
    torch.save({"opt": {}, "model": sd}, path)
    with pytest.raises(ValueError, match="mystery.extra.weight"):
        import_torch_checkpoint(path)


def test_bare_state_dict_and_bad_file(tmp_path):
    from tests.test_unet_torch_parity import build_models

    ref, _ = build_models()
    path = str(tmp_path / "bare.pt")
    torch.save(ref.state_dict(), path)  # no {"model": ...} wrapper
    assert detect_backbone(load_torch_state_dict(path)) == "unet3d"
    bad = str(tmp_path / "bad.pt")
    torch.save({"stuff": [1, 2, 3]}, bad)
    with pytest.raises(ValueError, match="not a reference checkpoint"):
        load_torch_state_dict(bad)


# ---------------------------------------------------------------------------
# CLI round trip: torch file → import-checkpoint → Trainer.load → sample

def test_import_checkpoint_cli_roundtrip(workspace):
    from models.backbones.unet import UNet as RefUNet

    from crowdmod_tpu.cli import import_checkpoint as cli
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer

    cfg = load_config(workspace["cfg"], workspace["list"])
    node = cfg.MODEL.DDPM.UNET
    torch.manual_seed(3)
    ref = RefUNet(
        input_channels=3, output_channels=3,
        num_res_blocks=node.NUM_RES_BLOCKS, base_channels=node.BASE_CH,
        base_channels_multiples=list(node.BASE_CH_MULT),
        apply_attention=list(node.APPLY_ATTENTION),
        dropout_rate=node.DROPOUT_RATE, time_multiple=node.TIME_EMB_MULT,
        condition=node.CONDITION,
    ).eval()
    pt = str(workspace["tmp"] / "torch_run.pt")
    torch.save({"opt": {}, "model": ref.state_dict()}, pt)

    rc = cli.run([
        "--config-yml-file", workspace["cfg"],
        "--configList-yml-file", workspace["list"],
        "--arch", "DDPM-UNet", "--torch-ckpt", pt,
    ])
    assert rc == 0
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR, ckpt.checkpoint_name(cfg, "DDPM-UNet", "000")
    )
    assert os.path.isdir(path)
    meta = ckpt.read_metadata(path)
    assert meta["source"].startswith("torch-import:")

    trainer = Trainer(cfg, "DDPM-UNet")
    trainer.setup()
    trainer.load(path)

    b = 2
    h, w = cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS
    p, f = cfg.DATASET.PAST_LEN, cfg.DATASET.FUTURE_LEN
    rng = np.random.default_rng(1)
    past = rng.normal(size=(b, 3, h, w, p)).astype(np.float32)
    future = rng.normal(size=(b, 3, h, w, f)).astype(np.float32)
    t = np.array([2, 4])
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(future), torch.tensor(t), torch.tensor(past)
        ).numpy()
    to_native = lambda x: jnp.transpose(jnp.asarray(x), (0, 4, 2, 3, 1))
    out = trainer.model.apply(
        trainer.state.params, to_native(future), jnp.asarray(t),
        to_native(past), deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_ref, (0, 4, 2, 3, 1)), atol=2e-4,
        err_msg="CLI-imported checkpoint diverges from the torch model",
    )
