"""Protocol-level fidelity parity against the reference *program*.

Round-1 parity was per-module (bit/2e-4) plus a 20-step chain.  This module
closes VERDICT round-1 item 2: it drives the mounted reference end-to-end —
its own loader (utils/dataset.py:108-185), its own trainer
(models/diffusion/ddpm.py:157-205), its own checkpoint format
(utils/utils.py:140-147), its own sampling protocol and its own metric CSV
writer (ddpm.py:336-392 → metricsGenerator.py:342-358) — on a walker
fixture, then checks the BASELINE.md criterion at artifact level:

  * the reference-trained checkpoint, mapped into our flax UNet, denoises
    identically over the FULL reverse chain (same injected noise);
  * our MetricsEngine, fed the exact pred/GT tensors the reference produced
    in its generate_metrics protocol, emits metric arrays and CSV files
    that match the reference's own CSVs.

The reference's missing deps (easydict/wandb/torchmetrics/skimage/sklearn/
pandas) are provided by tests/_ref_deps (see its README for the SSIM
caveat).  The reference code itself runs unmodified, except its boxplot
step is no-op'd (its CSV inputs are compared directly instead).
"""

import os
import pickle
import re
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

# Fixture geometry: same UNet shape as tests/test_unet_torch_parity.py so
# its map_params applies unchanged.
H, W, L, C = 8, 12, 16, 3
PAST, FUT = 5, 3
BASE, MULT, ATTN, RES_BLOCKS = 16, [1, 2], [False, True], 1
T = 25          # diffusion timesteps (full-chain length for this fixture)
BATCH = 4
CHUNK = 2       # chunkRepdPastSeq
SAMPLES_PER_BATCH = BATCH * CHUNK
EPOCHS = 3


def _ref_cfg_dict(tmp: str) -> dict:
    """Reference-schema config (mirrors /root/reference/config/4test/ATC.yml
    keys, with TRAIN nested under UNET as ddpm.py:53-63 requires)."""
    return {
        "DATA_FS": {
            "RAW_DATA_DIR": tmp, "AGG_DATA_DIR": tmp,
            "PICKLE_DIR": os.path.join(tmp, "pickle/"),
            "OUTPUT_DIR": os.path.join(tmp, "out_ref"),
            "SAVE_DIR": os.path.join(tmp, "ckpt/"),
            "USE_PICKLE": False,
        },
        "MACROPROPS": {
            "ROWS": H, "COLS": W, "DX": 1.0, "DY": 1.0,
            "LU": [38.2789, -15.8076], "EPS": 1e-6, "STRIDE": 10,
            "THETA": 2.5647, "TIME_RES": 0.5,
        },
        "DATASET": {
            "NAME": "ATC4TEST", "PAST_LEN": PAST, "FUTURE_LEN": FUT,
            "RAW_SEQ_LEN": L, "TRAIN_FILE_COUNT": 2, "VAL_FILE_COUNT": 1,
            "TEST_FILE_COUNT": 1, "BATCH_SIZE": BATCH,
            "params": {"shuffle": True, "num_workers": 0, "drop_last": True},
            "DATASET_TYPE": "ByFilenames", "VELOCITY_NORM": False,
        },
        "MODEL": {
            "NAME": "{}_ATC4TEST_TE{}_PL{}_FL{}_CE{}_{}.pth",
            "NSAMPLES": SAMPLES_PER_BATCH, "NSAMPLES4PLOTS": 2,
            "DDPM": {
                "SAMPLER": "DDPM", "TIMESTEPS": T, "SCALE": 0.5,
                "SIGMA": 0.001, "DDIM_DIVIDER": 2, "GUIDANCE": "None",
                "LAMBDA_GUIDANCE": 0.004, "CHECKPOINTS_TO_KEEP": 0,
                "UNET": {
                    "CONDITION": "Past", "CONDITION_HANDLING": "embed",
                    "NUM_RES_BLOCKS": RES_BLOCKS, "BASE_CH": BASE,
                    "BASE_CH_MULT": MULT, "APPLY_ATTENTION": ATTN,
                    "DROPOUT_RATE": 0.1, "TIME_EMB_MULT": 4,
                    "TRAIN": {
                        "EPOCHS": EPOCHS,
                        "SOLVER": {
                            "LR": 5e-4, "WEIGHT_DECAY": 0.003,
                            "BETAS": [0.5, 0.999],
                            "SCHEDULER": {
                                "FACTOR": 0.5, "PATIENCE": 5,
                                "MIN_LR": 1e-6,
                            },
                        },
                    },
                },
            },
        },
        "METRICS": {
            "PRED_MPROPS_FACTOR": [1, 1, 1], "MPROPS_COUNT": 3,
            "MOTION_FEATURE": {"f": 1, "k": 4, "s": 1, "GAMMA": 0.5},
        },
    }


def _to_native(a: np.ndarray) -> np.ndarray:
    """Reference (N, C, H, W, T) → our (N, T, H, W, C)."""
    return np.ascontiguousarray(np.transpose(a, (0, 4, 2, 3, 1)))


def _ref_energy_metric_fixed(mg, chunk: int) -> None:
    """metricsGenerator.py:259-290 with the broken first line (:264)
    replaced by its evident intent; everything else, including the energy
    functional itself, is the reference's code."""
    from models.guidance import compute_energy  # noqa: E402 - reference

    mprops_factor = np.array(
        list(mg.params.PRED_MPROPS_FACTOR), np.float32
    )[: mg.params.MPROPS_COUNT, np.newaxis, np.newaxis, np.newaxis]
    nsamples = len(mg.pred_seq_list)
    nsamples_energy = np.zeros((nsamples, 2))
    min_energy = np.zeros((nsamples // chunk, 2))
    pred_seq_tensor = torch.stack(mg.pred_seq_list).cpu()
    gt_seq_tensor = torch.stack(mg.gt_seq_list).cpu()
    pred_seq_tensor = pred_seq_tensor * mprops_factor[np.newaxis, ...]
    gt_seq_tensor = gt_seq_tensor * mprops_factor[np.newaxis, ...]
    pred_seq_energy = compute_energy(pred_seq_tensor, delta_t=1, delta_l=1)
    gt_seq_energy = compute_energy(gt_seq_tensor, delta_t=1, delta_l=1)
    nsamples_energy[:, 0] = gt_seq_energy
    nsamples_energy[:, 1] = pred_seq_energy
    for i in range(0, nsamples, chunk):
        energy_chunk = nsamples_energy[i : i + chunk]
        min_energy[i // chunk] = (
            energy_chunk[:, 0].min(), energy_chunk[:, 1].min()
        )
    mg.data_dict["ENERGY"] = nsamples_energy
    mg.data_dict["MIN-ENERGY"] = min_energy


def write_walker_pickles(cfg_dict: dict) -> None:
    """Write the walker fixture in the reference pickle layout
    (n, 4, H, W, L) and fill in cfg_dict["DATA_LIST"].  Shared with
    tests/test_fm_convrnn_protocol_parity.py."""
    from crowdmod_tpu.data.synthetic import synthetic_walkers

    rng = np.random.default_rng(0)
    data_list = []
    for k in range(4):
        native = synthetic_walkers(8, H, W, L, row=2 + k)  # (n, L, H, W, 3)
        native = native + 0.05 * rng.normal(size=native.shape).astype(
            np.float32
        )
        ref_layout = np.transpose(native, (0, 4, 2, 3, 1))  # (n, 3, H, W, L)
        arr = np.concatenate(
            [ref_layout, np.zeros_like(ref_layout[:, :1])], axis=1
        ).astype(np.float32)  # 4th channel as in real pickles
        name = f"walker{k}.pkl"
        with open(os.path.join(cfg_dict["DATA_FS"]["PICKLE_DIR"], name),
                  "wb") as f:
            pickle.dump(arr, f)
        data_list.append([name, 8])
    cfg_dict["DATA_LIST"] = data_list


@pytest.fixture(scope="module")
def protocol(tmp_path_factory):
    """Run the reference program end-to-end; return everything both sides
    need (trained model, captured pred/GT, reference CSV dir)."""
    import random

    tmp = tmp_path_factory.mktemp("protocol")
    cfg_dict = _ref_cfg_dict(str(tmp))
    os.makedirs(cfg_dict["DATA_FS"]["PICKLE_DIR"], exist_ok=True)
    os.makedirs(cfg_dict["DATA_FS"]["SAVE_DIR"], exist_ok=True)
    os.makedirs(cfg_dict["DATA_FS"]["OUTPUT_DIR"], exist_ok=True)

    write_walker_pickles(cfg_dict)

    from easydict import EasyDict

    cfg = EasyDict(cfg_dict)

    # --- reference program: load → train → checkpoint --------------------
    random.seed(0)
    np.random.seed(0)
    torch.manual_seed(42)  # train.py:25

    from utils.utils import (  # noqa: E402 - reference import
        get_filenames_paths, get_model_fullname, get_test_dataset,
        get_training_dataset,
    )
    import models.diffusion.ddpm as ref_ddpm  # noqa: E402

    files = get_filenames_paths(cfg)
    batched_train, _ = get_training_dataset(cfg, files, mprops_count=C)
    model = ref_ddpm.DDPM_model(cfg, "DDPM-UNet", C)
    model.train(batched_train)
    ckpt = get_model_fullname(cfg, "DDPM-UNet", "000")
    assert os.path.exists(ckpt), f"reference checkpoint not written: {ckpt}"

    # --- reference program: test set → sampling → metric CSVs ------------
    captured = {}
    orig_mg = ref_ddpm.MetricsGenerator

    class RecordingMG(orig_mg):
        def __init__(self, pred_seq_list, gt_seq_list, params,
                     output_dir=None):
            super().__init__(pred_seq_list, gt_seq_list, params, output_dir)
            captured["mg"] = self

        def save_metrics_boxplots(self, title):
            pass  # CSV inputs compared directly; pandas is shimmed out

    ref_ddpm.MetricsGenerator = RecordingMG
    try:
        torch.manual_seed(42)  # generate_metrics.py:20
        batched_test = get_test_dataset(cfg, files, mprops_count=C)
        out_ref = cfg.DATA_FS.OUTPUT_DIR
        metrics_model = ref_ddpm.DDPM_model(cfg, "DDPM-UNet", C, out_ref)
        metrics_model.generate_metrics(
            batched_test, CHUNK, "ALL", 1, SAMPLES_PER_BATCH, ckpt, out_ref
        )
    finally:
        ref_ddpm.MetricsGenerator = orig_mg

    mg = captured["mg"]
    match = re.search(r"TE\d+_PL\d+_FL\d+_CE\d+_NA", ckpt)
    # The reference's compute_energy_metric is unreachable as shipped: its
    # first line reads `mprops_factor` before assignment
    # (metricsGenerator.py:264), which is why the 'ALL' dispatch guards it
    # behind the 'ALLA' typo (:390).  Run its body (:265-290) with the one
    # evident fix — mprops_factor = PRED_MPROPS_FACTOR — so the ENERGY
    # artifact can still be compared against the reference's own
    # models/guidance.py::compute_energy oracle.
    _ref_energy_metric_fixed(mg, CHUNK)
    mg.save_data_metrics(match, "protocol parity", SAMPLES_PER_BATCH)

    pred = _to_native(
        np.stack([t.cpu().numpy() for t in mg.pred_seq_list])
    )
    gt = _to_native(np.stack([t.cpu().numpy() for t in mg.gt_seq_list]))
    return {
        "cfg": cfg, "tmp": tmp, "denoiser": metrics_model.denoiser,
        "mg": mg, "match": match, "pred": pred, "gt": gt,
        "ref_csv_dir": out_ref, "batched_test": batched_test,
    }


@pytest.fixture(scope="module")
def ours_metrics(protocol, tmp_path_factory):
    """Our MetricsEngine on the exact pred/GT tensors the reference made."""
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.metrics.generator import MetricsEngine, compute_metrics

    out_dir = str(tmp_path_factory.mktemp("ours_csv"))
    cfg = load_config("4test/ATC.yml").updated({
        "MACROPROPS": {"ROWS": H, "COLS": W},
        "DATASET": {"PAST_LEN": PAST, "FUTURE_LEN": FUT},
    })
    eng = MetricsEngine(
        jnp.asarray(protocol["pred"]), jnp.asarray(protocol["gt"]),
        cfg.METRICS, output_dir=out_dir, past_len=PAST,
    )
    compute_metrics(
        eng, "ALL", CHUNK, eps=float(cfg.MACROPROPS.EPS),
        run_tag=protocol["match"].group(), title="protocol parity",
        samples_per_batch=SAMPLES_PER_BATCH, save=True, boxplots=False,
    )
    return {"engine": eng, "csv_dir": out_dir}


# Per-metric absolute tolerances for float32-jax vs float64-numpy pipelines.
# PSNR-family values are O(10-60) dB; SSIM/BHATT O(1); MF histograms O(1e-3).
_ATOL = {
    "PSNR": 5e-3, "MASK_PSNR": 5e-3, "MAX_PSNR": 5e-3, "MAX_MASK_PSNR": 5e-3,
    "PSNR_OVER_TIME": 5e-3, "MASK_PSNR_OVER_TIME": 5e-3,
    "MAX_PSNR_OVER_TIME": 5e-3, "MAX_MASK_PSNR_OVER_TIME": 5e-3,
    "SSIM": 1e-5, "MAX_SSIM": 1e-5, "SSIM_OVER_TIME": 1e-5,
    "MAX_SSIM_OVER_TIME": 1e-5,
    # MF histograms: a velocity magnitude can land on a different bin edge
    # in float32 vs float64, moving one count between adjacent bins — worth
    # ~1e-8 in the MSE and ~2e-3 in the Bhattacharyya statistics.
    "MF_MSE": 1e-8, "MF_BHATT_DIST": 5e-3, "MF_BHATT_COEF": 5e-3,
    "ENERGY": 5e-3, "MIN-ENERGY": 5e-3,
    "RE_DENSITY": 1e-4, "MIN_RE_DENSITY": 1e-4,
    "TV_OVER_TIME": 5e-4,
}


def test_metric_arrays_match_reference(protocol, ours_metrics):
    """Every metric array the reference computed matches ours (pre-CSV)."""
    ref_data = protocol["mg"].data_dict
    our_data = ours_metrics["engine"].data
    compared = []
    for name, ref_arr in ref_data.items():
        if ref_arr is None:
            continue
        assert name in our_data, f"our engine never computed {name}"
        ours = np.asarray(our_data[name], np.float64)
        ref_arr = np.asarray(ref_arr, np.float64)
        assert ours.shape == ref_arr.shape, (
            f"{name}: shape {ours.shape} vs reference {ref_arr.shape}"
        )
        np.testing.assert_allclose(
            ours, ref_arr, atol=_ATOL[name], rtol=1e-4,
            err_msg=f"metric {name} diverges from the reference pipeline",
        )
        compared.append(name)
    assert len(compared) >= 18, f"only compared {compared}"


def test_metric_csv_artifacts_match_reference(protocol, ours_metrics):
    """The emitted CSV files agree: same names, headers and values."""
    tag = protocol["match"].group()
    ref_dir, our_dir = protocol["ref_csv_dir"], ours_metrics["csv_dir"]
    ref_csvs = sorted(
        f for f in os.listdir(ref_dir) if f.endswith(".csv")
    )
    assert len(ref_csvs) >= 18, f"reference wrote only {ref_csvs}"
    for fname in ref_csvs:
        our_path = os.path.join(our_dir, fname)
        assert os.path.exists(our_path), f"we never wrote {fname}"
        with open(os.path.join(ref_dir, fname)) as f:
            ref_header = f.readline().strip()
        with open(our_path) as f:
            our_header = f.readline().strip()
        assert our_header == ref_header, f"{fname} header mismatch"
        ref_vals = np.loadtxt(
            os.path.join(ref_dir, fname), delimiter=",", skiprows=1,
            ndmin=2,
        )
        our_vals = np.loadtxt(our_path, delimiter=",", skiprows=1, ndmin=2)
        name = fname.split(f"_NS{SAMPLES_PER_BATCH}_")[0]
        # CSVs are %.4f on both sides; tolerate one rounding quantum on top
        # of the array tolerance.
        np.testing.assert_allclose(
            our_vals, ref_vals, atol=_ATOL.get(name, 1e-3) + 1.01e-4,
            rtol=1e-4, err_msg=f"CSV artifact {fname} diverges",
        )
        assert tag in fname


def test_trained_checkpoint_full_chain_parity(protocol):
    """The reference-trained checkpoint, mapped into our UNet3D, denoises
    identically over the full T-step protocol chain (same injected noise,
    real fixture pasts) — trained-weight, full-length version of
    tests/test_chain_torch_parity.py."""
    from tests.test_unet_torch_parity import map_params

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D

    ref_unet = protocol["denoiser"].eval()
    params = map_params(ref_unet)
    ours = UNet3D(
        out_channels=C, num_res_blocks=RES_BLOCKS, base_channels=BASE,
        base_channels_multiples=tuple(MULT), apply_attention=tuple(ATTN),
        dropout_rate=0.1, time_multiple=4, condition="Past",
    )

    past_t, _ = next(iter(protocol["batched_test"]))
    past_t = past_t.float()[:2]
    b = past_t.shape[0]

    from models.diffusion.ddpm import DDPM as RefDDPM  # noqa: E402

    sched_ref = RefDDPM(timesteps=T, scale=0.5)
    sched = linear_schedule(T, scale=0.5)

    rng = np.random.default_rng(11)
    x0 = rng.normal(size=(b, C, H, W, FUT)).astype(np.float32)
    zs = rng.normal(size=(T, b, C, H, W, FUT)).astype(np.float32)

    x_t = torch.tensor(x0)
    with torch.no_grad():
        for t in reversed(range(T)):
            tt = torch.full((b,), t, dtype=torch.long)
            eps = ref_unet(x_t, tt, past_t)
            z = torch.tensor(zs[t]) if t > 0 else torch.zeros_like(x_t)
            beta = sched_ref.beta[t]
            x_t = (
                sched_ref.one_by_sqrt_alpha[t]
                * (x_t - beta / sched_ref.sqrt_one_minus_alpha_bar[t] * eps)
                + torch.sqrt(beta) * z
            )
    out_ref = _to_native(x_t.numpy())

    to_native = lambda a: jnp.asarray(_to_native(a))
    x = to_native(x0)
    past = to_native(past_t.numpy())
    zs_native = jnp.asarray(np.transpose(zs, (0, 1, 5, 3, 4, 2)))

    @jax.jit
    def chain(x, past, zs_native):
        def body(x, t):
            t_vec = jnp.full((b,), t, dtype=jnp.int32)
            eps = ours.apply(params, x, t_vec, past)
            z = jnp.where(t > 0, zs_native[t], jnp.zeros_like(x))
            beta = sched.beta[t]
            x = (
                sched.one_by_sqrt_alpha[t]
                * (x - beta / sched.sqrt_one_minus_alpha_bar[t] * eps)
                + jnp.sqrt(beta) * z
            )
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(T - 1, -1, -1))
        return x

    out = np.asarray(chain(x, past, zs_native))
    np.testing.assert_allclose(
        out, out_ref, atol=1e-3,
        err_msg="trained-checkpoint full reverse chains diverge",
    )
