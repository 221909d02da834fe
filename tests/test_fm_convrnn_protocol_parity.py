"""Protocol-level parity for the FM and ConvRNN families.

tests/test_protocol_parity.py proves the DDPM pipeline at artifact level
(reference program train → checkpoint → sample → metric CSVs).  This module
extends the same methodology to the other two model families:

  * **FM-UNet**: the reference FM trainer (flow_matching.py:104-201 —
    interpolant draw, Adam/ReduceLROnPlateau protocol, best-loss "000"
    checkpoint via save_checkpoint with the W_TYPE name tag,
    utils/utils.py:128-147) runs end-to-end on the walker fixture; the
    trained checkpoint is mapped into our flax UNet3D and must integrate
    identically over the full Euler chain (flow_matching.py:204-226) AND
    the full Heun chain (:228-250 — the reference's intended RK2 math,
    unreachable through its own registry bug at :44-47, which we fixed).
  * **ConvRNN**: the reference ConvRNN trainer (convRNN.py:98-220 —
    composite KL-Poisson + masked-velocity loss via utils/loss.py,
    teacher-forced recurrence) runs end-to-end; the trained Forecaster
    (forecaster.py:23-198) is weight-mapped — all three scales, both
    ConvTranspose up-paths and the two head convs — into our Forecaster
    and must reproduce the reference's `_generate_convRNN` inference
    (convRNN.py:224-231, exp on the rho/sigma2 channels) bit-for-nearly
    over the full autoregressive rollout, and the teacher-forced variant.

The metric-CSV side of generate_metrics is family-independent (both FM and
ConvRNN drive the same MetricsGenerator the DDPM module already matches
CSV-for-CSV), so it is not re-proven here.
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

_STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_ref_deps")
for _p in (_STUBS, REFERENCE):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from tests.test_protocol_parity import (  # noqa: E402
    _ref_cfg_dict, _to_native, write_walker_pickles,
    H, W, L, C, PAST, FUT, BASE, MULT, ATTN, RES_BLOCKS, BATCH,
)

# FM integrator protocol (cfg.MODEL.FM.* in the reference).
TMAX = 25
EULER_STEPS = 20
HEUN_STEPS = 10
FM_EPOCHS = 3

# ConvRNN protocol: shared-state-slot channels (ENC[1,3,5] == FORC[5,3,1],
# forecaster.py:35-71) at test scale; H, W divisible by 4.
ENC_CH = [8, 16, 16, 24, 24, 24]
FORC_CH = [24, 24, 24, 24, 24, 16, 8]
ENC_K = [3, 3, 3, 3, 3, 3]
FORC_K = [3, 4, 3, 4, 3, 3, 3]
CONVRNN_EPOCHS = 2
MPROPS_CONVRNN = 4  # train.py:59 — ConvRNN consumes all 4 channels


def _family_cfg(tmp: str) -> dict:
    cfg = _ref_cfg_dict(tmp)
    solver = {
        "LR": 5e-4, "WEIGHT_DECAY": 0.003, "BETAS": [0.5, 0.999],
        "SCHEDULER": {"FACTOR": 0.5, "PATIENCE": 5, "MIN_LR": 1e-6},
    }
    cfg["MODEL"]["FM"] = {
        "W_TYPE": "Linear", "TIME_MAX_POS": TMAX,
        "INTEGRATOR": "Euler",
        "INTEGRATOR_STEPS": {"EULER": EULER_STEPS, "HEUN": HEUN_STEPS},
        "CHECKPOINTS_TO_KEEP": 0,
        "UNET": {
            "CONDITION": "Past", "NUM_RES_BLOCKS": RES_BLOCKS,
            "BASE_CH": BASE, "BASE_CH_MULT": MULT,
            "APPLY_ATTENTION": ATTN, "DROPOUT_RATE": 0.1,
            "TIME_EMB_MULT": 4,
            "TRAIN": {"EPOCHS": FM_EPOCHS, "SOLVER": dict(solver)},
        },
    }
    cfg["MODEL"]["CONVRNN"] = {
        "CELL_CLASS": "ConvGRUCell", "TEACHER_FORCING": True,
        "ENC_HIDDEN_CH": ENC_CH, "FORC_HIDDEN_CH": FORC_CH,
        "ENC_KERNELS": ENC_K, "FORC_KERNELS": FORC_K,
        "TRAIN": {
            "EPOCHS": CONVRNN_EPOCHS,
            "SOLVER": {
                "LR": 1e-3, "WEIGHT_DECAY": 1e-4, "BETAS": [0.9, 0.999],
                "SCHEDULER": {"FACTOR": 0.5, "PATIENCE": 10,
                              "MIN_LR": 1e-6},
            },
        },
    }
    return cfg


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    """Walker pickles + reference-schema config + reference data loaders."""
    import random

    tmp = tmp_path_factory.mktemp("fm_convrnn_protocol")
    cfg_dict = _family_cfg(str(tmp))
    for key in ("PICKLE_DIR", "SAVE_DIR", "OUTPUT_DIR"):
        os.makedirs(cfg_dict["DATA_FS"][key], exist_ok=True)
    write_walker_pickles(cfg_dict)

    from easydict import EasyDict

    cfg = EasyDict(cfg_dict)
    random.seed(0)
    np.random.seed(0)
    torch.manual_seed(42)  # train.py:25

    from utils.utils import get_filenames_paths  # noqa: E402 - reference

    files = get_filenames_paths(cfg)
    return {"cfg": cfg, "files": files, "tmp": tmp}


# ---------------------------------------------------------------------------
# FM-UNet
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fm_protocol(fixture_env):
    """Reference FM program: load → train → best-loss checkpoint →
    checkpoint reload (the sampling protocol's own load path)."""
    from utils.utils import (  # noqa: E402 - reference
        get_model_fullname, get_test_dataset, get_training_dataset,
    )
    from models.flow_matching.flow_matching import FM_model  # noqa: E402

    cfg, files = fixture_env["cfg"], fixture_env["files"]
    torch.manual_seed(42)
    batched_train, _ = get_training_dataset(cfg, files, mprops_count=C)
    fm = FM_model(cfg, "FM-UNet", C)
    fm.train(batched_train)

    ckpt = get_model_fullname(cfg, "FM-UNet", "000")
    assert os.path.exists(ckpt), f"reference FM checkpoint missing: {ckpt}"
    assert cfg.MODEL.FM.W_TYPE in os.path.basename(ckpt)  # name tag protocol

    # flow_matching.py:256 — sampling reloads the checkpoint from disk.
    fm.u_predictor.load_state_dict(
        torch.load(ckpt, map_location="cpu", weights_only=True)["model"]
    )
    fm.u_predictor.eval()

    batched_test = get_test_dataset(cfg, files, mprops_count=C)
    past_t, _ = next(iter(batched_test))
    past_t = past_t.float()[:2]
    return {"fm": fm, "past_t": past_t}


def _mapped_unet(ref_unet):
    from tests.test_unet_torch_parity import map_params

    from crowdmod_tpu.models.backbones import UNet3D

    ours = UNet3D(
        out_channels=C, num_res_blocks=RES_BLOCKS, base_channels=BASE,
        base_channels_multiples=tuple(MULT), apply_attention=tuple(ATTN),
        dropout_rate=0.1, time_multiple=4, condition="Past",
    )
    return ours, map_params(ref_unet)


def test_fm_trained_euler_chain_parity(fm_protocol):
    """Trained-checkpoint full Euler integration (flow_matching.py:204-226):
    same x0, same time-index quantization, identical terminal states."""
    from crowdmod_tpu.models.flow_matching import euler_sample

    ref_unet = fm_protocol["fm"].u_predictor
    past_t = fm_protocol["past_t"]
    b = past_t.shape[0]
    ours, params = _mapped_unet(ref_unet)

    key = jax.random.PRNGKey(7)
    shape = (b, FUT, H, W, C)
    x0 = np.asarray(jax.random.normal(key, shape, jnp.float32))
    xt = torch.tensor(np.transpose(x0, (0, 4, 2, 3, 1)))
    delta = 1.0 / EULER_STEPS
    with torch.no_grad():
        for t in torch.linspace(0, 1, EULER_STEPS):
            ti = (t * TMAX).clamp(0, TMAX - 1).long().expand(b)
            xt = xt + delta * ref_unet(xt, ti, past_t)
    ref_out = _to_native(xt.numpy())

    denoise = lambda x, t, c: ours.apply(params, x, t, c)
    out = euler_sample(
        denoise, jnp.asarray(np.transpose(past_t.numpy(), (0, 4, 2, 3, 1))),
        key, shape, steps=EULER_STEPS, time_max_pos=TMAX,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out, atol=1e-3,
        err_msg="trained FM Euler chains diverge",
    )


def test_fm_trained_heun_chain_parity(fm_protocol):
    """Trained-checkpoint full Heun RK2 chain (flow_matching.py:228-250,
    including the +1 embedding offset of the second stage)."""
    from crowdmod_tpu.models.flow_matching import heun_sample

    ref_unet = fm_protocol["fm"].u_predictor
    past_t = fm_protocol["past_t"]
    b = past_t.shape[0]
    ours, params = _mapped_unet(ref_unet)

    key = jax.random.PRNGKey(8)
    shape = (b, FUT, H, W, C)
    x0 = np.asarray(jax.random.normal(key, shape, jnp.float32))
    xt = torch.tensor(np.transpose(x0, (0, 4, 2, 3, 1)))
    delta = 1.0 / HEUN_STEPS
    with torch.no_grad():
        for t in torch.linspace(0, 1, HEUN_STEPS):
            ti = (t * TMAX).clamp(0, TMAX - 1).long().expand(b)
            k1 = ref_unet(xt, ti, past_t)
            k2 = ref_unet(xt + delta * k1, ti + 1, past_t)
            xt = xt + 0.5 * delta * (k1 + k2)
    ref_out = _to_native(xt.numpy())

    denoise = lambda x, t, c: ours.apply(params, x, t, c)
    out = heun_sample(
        denoise, jnp.asarray(np.transpose(past_t.numpy(), (0, 4, 2, 3, 1))),
        key, shape, steps=HEUN_STEPS, time_max_pos=TMAX,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out, atol=1e-3,
        err_msg="trained FM Heun chains diverge",
    )


# ---------------------------------------------------------------------------
# ConvRNN
# ---------------------------------------------------------------------------


def _conv2d_w(t):  # torch (O, I, kh, kw) → flax (kh, kw, I, O)
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def _convT_w(t):
    """torch ConvTranspose2d (I, O, kh, kw) → flax nn.ConvTranspose
    (transpose_kernel=False) kernel (kh, kw, I, O), spatially flipped —
    verified exact vs torch's k=4/pad=1/stride=2 up-convolution."""
    w = t.detach().numpy()
    return jnp.asarray(
        np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    )


def _map_gru_nobias(ref):
    return {
        "gates": {
            "kernel": jnp.concatenate(
                [_conv2d_w(ref.reset_gate.weight),
                 _conv2d_w(ref.update_gate.weight)], axis=-1
            ),
        },
        "candidate": {"kernel": _conv2d_w(ref.conv_cand.weight)},
    }


def _map_forecaster(ref):
    """Full weight map: reference Forecaster (forecaster.py:23-87 module
    lists, bias=False throughout — convRNN.py:47) → our flax Forecaster."""
    enc = ref.encoder.encoder_cell_list
    fl = ref.forecaster_cell_list
    return {"params": {
        "encoder": {
            "conv1": {"kernel": _conv2d_w(enc[0].weight)},
            "rnn1": _map_gru_nobias(enc[1]),
            "down1": {"kernel": _conv2d_w(enc[2].weight)},
            "rnn2": _map_gru_nobias(enc[3]),
            "down2": {"kernel": _conv2d_w(enc[4].weight)},
            "rnn3": _map_gru_nobias(enc[5]),
        },
        "frnn1": _map_gru_nobias(fl[0]),
        "fup1": {"kernel": _convT_w(fl[1].weight)},
        "frnn2": _map_gru_nobias(fl[2]),
        "fup2": {"kernel": _convT_w(fl[3].weight)},
        "frnn3": _map_gru_nobias(fl[4]),
        "fconv4": {"kernel": _conv2d_w(fl[5].weight)},
        "head": {"kernel": _conv2d_w(fl[6].weight)},
    }}


@pytest.fixture(scope="module")
def convrnn_protocol(fixture_env):
    """Reference ConvRNN program: load (4-channel) → train (teacher-forced,
    composite loss) → best-loss checkpoint → reload."""
    from utils.utils import (  # noqa: E402 - reference
        get_model_fullname, get_test_dataset, get_training_dataset,
    )
    from models.convRNN.convRNN import ConvRNN_model  # noqa: E402

    cfg, files, tmp = (
        fixture_env["cfg"], fixture_env["files"], fixture_env["tmp"]
    )

    # Newly-found shipped defect in the reference: get_checkpoint_save_path
    # and get_model_fullname both call get_backbone_cfg(cfg, arch)
    # unconditionally (utils/utils.py:124,153), and get_backbone_cfg
    # unpacks arch.upper().split('-') into two parts (:116) — "ConvRNN"
    # has no hyphen, so the reference crashes on every ConvRNN checkpoint
    # save/load as shipped.  The ConvRNN branches of both functions never
    # use the backbone_cfg result, so the evident intent is recovered by
    # making get_backbone_cfg answer for "ConvRNN"; everything downstream
    # is the reference's own code.  (Our framework keeps explicit orbax
    # metadata instead of filename parsing — train/checkpoint.py.)
    import utils.utils as ref_utils  # noqa: E402 - reference

    if not getattr(ref_utils.get_backbone_cfg, "_convrnn_patched", False):
        _orig_gbc = ref_utils.get_backbone_cfg

        def _gbc_fixed(cfg_, arch_):
            if arch_ == "ConvRNN":
                return cfg_.MODEL.CONVRNN
            return _orig_gbc(cfg_, arch_)

        _gbc_fixed._convrnn_patched = True
        ref_utils.get_backbone_cfg = _gbc_fixed

    torch.manual_seed(42)
    batched_train, batched_val = get_training_dataset(
        cfg, files, mprops_count=MPROPS_CONVRNN
    )
    out_dir = os.path.join(str(tmp), "out_convrnn")
    model = ConvRNN_model(
        cfg, "ConvRNN", mprops_count=MPROPS_CONVRNN, output_dir=out_dir
    )
    model.train(batched_train, batched_val)

    ckpt = get_model_fullname(cfg, "ConvRNN", "000")
    assert os.path.exists(ckpt), f"reference ConvRNN checkpoint missing"
    assert "GRUCell" in os.path.basename(ckpt)  # cell name tag protocol
    model.convRNN.load_state_dict(
        torch.load(ckpt, map_location="cpu", weights_only=True)["model"]
    )
    model.convRNN.eval()

    batched_test = get_test_dataset(cfg, files, mprops_count=MPROPS_CONVRNN)
    x_t, y_t = next(iter(batched_test))
    return {"model": model, "x_t": x_t.float()[:2], "y_t": y_t.float()[:2]}


def _our_forecaster():
    from crowdmod_tpu.models.convrnn.cells import ConvGRUCell
    from crowdmod_tpu.models.convrnn.forecaster import Forecaster

    return Forecaster(
        out_channels=MPROPS_CONVRNN,
        enc_hidden_channels=tuple(ENC_CH),
        forc_hidden_channels=tuple(FORC_CH),
        enc_kernels=tuple(ENC_K), forc_kernels=tuple(FORC_K),
        cell=ConvGRUCell, use_bias=False,
    )


@pytest.mark.parametrize("teacher_forcing", [False, True])
def test_convrnn_trained_rollout_parity(convrnn_protocol, teacher_forcing):
    """The reference-program-trained Forecaster, fully weight-mapped,
    reproduces `_generate_convRNN` (convRNN.py:224-231): the 3-step
    autoregressive rollout with exp-feedback (and the teacher-forced
    variant), with exp applied to the rho/sigma2 output channels."""
    model = convrnn_protocol["model"]
    x_t, y_t = convrnn_protocol["x_t"], convrnn_protocol["y_t"]

    ref_out = model._generate_convRNN(x_t, y_t, teacher_forcing)
    ref_out = _to_native(ref_out.numpy())

    fc = _our_forecaster()
    params = _map_forecaster(model.convRNN)
    past = _to_native(x_t.numpy())
    target = _to_native(y_t.numpy())
    pred = fc.apply(
        params, jnp.asarray(past), target=jnp.asarray(target),
        teacher_forcing=teacher_forcing,
    )
    # _generate_convRNN's inference exp on channels 0 (rho) and 3 (sigma2).
    out = np.array(pred)
    out[..., 0] = np.exp(out[..., 0])
    out[..., 3] = np.exp(out[..., 3])

    np.testing.assert_allclose(
        out, ref_out, atol=2e-4,
        err_msg=f"trained ConvRNN rollout (tf={teacher_forcing}) diverges",
    )
