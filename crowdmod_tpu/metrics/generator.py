"""Metrics orchestration: batched on-device compute + reference-shape export.

Rebuild of ``MetricsGenerator``/``compute_metrics``
(/root/reference/utils/metrics/metricsGenerator.py:12-399).  The engine takes
the whole prediction/GT stacks as arrays (no per-sequence Python lists), runs
each selected metric as one jitted call, and exports CSVs + a
``metrics_files.json`` manifest with the reference's header and filename
conventions so downstream comparison tooling keeps working.

Known reference defect NOT copied: ``compute_energy_metric`` uses
``mprops_factor`` before assignment (metricsGenerator.py:264) — here the
per-channel PRED_MPROPS_FACTOR is applied before the energy, as intended.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from crowdmod_tpu.metrics import functional as F
from crowdmod_tpu.models.guidance import continuity_energy

HEADERS = {
    "PSNR": "rho,vx,vy",
    "MASK_PSNR": "rho,vx,vy",
    "SSIM": "rho,vx,vy",
    "MAX_PSNR": "rho,vx,vy",
    "MAX_MASK_PSNR": "rho,vx,vy",
    "MAX_SSIM": "rho,vx,vy",
    "MF_MSE": "MSE_Hist_2D_Based,MSE_Hist_1D_Based",
    "MF_BHATT_DIST": "BHATT_DIST_Hist_2D_Based,BHATT_DIST_Hist_1D_Based",
    "MF_BHATT_COEF": "BHATT_COEF_Hist_2D_Based,BHATT_COEF_Hist_1D_Based",
    "ENERGY": "GT,PRED",
    "MIN-ENERGY": "GT,PRED",
    "RE_DENSITY": None,       # per-frame columns, built dynamically
    "MIN_RE_DENSITY": None,
    "PSNR_OVER_TIME": None,
    "MASK_PSNR_OVER_TIME": None,
    "SSIM_OVER_TIME": None,
    "TV_OVER_TIME": None,
    "MAX_PSNR_OVER_TIME": None,
    "MAX_MASK_PSNR_OVER_TIME": None,
    "MAX_SSIM_OVER_TIME": None,
}

_CHANNELS = ("rho", "vx", "vy")

METRIC_CHOICES = (
    "PSNR", "MASK_PSNR", "SSIM", "MF_MSE", "MF_BHATT", "ENERGY",
    "RE_DENSITY", "TV", "ALL",
)


def _flatten_over_time(x: np.ndarray) -> np.ndarray:
    """(N, F, C) → (N, F*C) in the reference's ch-within-frame column order."""
    n, f, c = x.shape
    return x.reshape(n, f * c)


def _ot_header(pred_len: int, past_len: int = 5) -> str:
    """e.g. 'rho_f6,vx_f6,vy_f6,rho_f7,...' — frame ids continue the past
    numbering, as the reference's fixed headers do (f6..f8 for P=5,F=3)."""
    cols = []
    for j in range(pred_len):
        fid = past_len + 1 + j
        cols += [f"{ch}_f{fid}" for ch in _CHANNELS]
    return ",".join(cols)


def _re_header(pred_len: int, past_len: int = 5) -> str:
    return ",".join(f"re_f{past_len + 1 + j}" for j in range(pred_len))


@dataclass
class MetricsEngine:
    """Compute fidelity metrics for predicted vs GT future blocks.

    Args:
      pred, gt: ``(N, F, H, W, C)`` native-layout stacks (C = 3).
      params: the METRICS config node (MPROPS_COUNT, MOTION_FEATURE,
        PRED_MPROPS_FACTOR).
      output_dir: CSV/manifest destination (created on demand).
      past_len: only used for over-time column labels.
    """

    pred: jnp.ndarray
    gt: jnp.ndarray
    params: object
    output_dir: str | None = None
    past_len: int = 5
    data: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.pred.shape != self.gt.shape:
            raise ValueError(
                f"pred {self.pred.shape} vs gt {self.gt.shape} shape mismatch"
            )
        self.ranges = F.channel_ranges(self.gt)

    # ------------------------------------------------------------------
    @property
    def pred_len(self) -> int:
        return self.pred.shape[1]

    def compute_psnr(self, chunk: int, eps: float = 1e-6, masked: bool = False):
        ot = F.psnr_over_time(self.pred, self.gt, self.ranges, eps, masked)
        per_seq = jnp.mean(ot, axis=1)  # (N, C)
        tag = "MASK_PSNR" if masked else "PSNR"
        self.data[tag] = np.asarray(per_seq)
        self.data[f"MAX_{tag}"] = np.asarray(F.chunk_reduce(per_seq, chunk))
        # Flatten (N, F, C) → (N, F*C) on device (a reshape is free there) so
        # chunk_reduce runs before the single host transfer.
        flat = ot.reshape(ot.shape[0], -1)
        self.data[f"{tag}_OVER_TIME"] = np.asarray(flat)
        self.data[f"MAX_{tag}_OVER_TIME"] = np.asarray(F.chunk_reduce(flat, chunk))

    def compute_ssim(self, chunk: int):
        ot = F.ssim_over_time(self.pred, self.gt, self.ranges)
        per_seq = jnp.mean(ot, axis=1)
        self.data["SSIM"] = np.asarray(per_seq)
        self.data["MAX_SSIM"] = np.asarray(F.chunk_reduce(per_seq, chunk))
        flat = ot.reshape(ot.shape[0], -1)
        self.data["SSIM_OVER_TIME"] = np.asarray(flat)
        self.data["MAX_SSIM_OVER_TIME"] = np.asarray(F.chunk_reduce(flat, chunk))

    def compute_motion_features(self, mse: bool = True, bhatt: bool = True):
        mf = self.params.MOTION_FEATURE
        import jax

        mf2 = jax.vmap(
            lambda s: F.motion_feature_2d(s, f=mf.f, k=mf.k)
        )
        mf1 = jax.vmap(
            lambda s: F.motion_feature_1d(s, f=mf.f, k=mf.k, gamma=mf.GAMMA)
        )
        p2, g2 = mf2(self.pred), mf2(self.gt)
        p1, g1 = mf1(self.pred), mf1(self.gt)

        if mse:
            mse2 = jnp.mean(jnp.square(p2 - g2), axis=1)
            mse1 = jnp.mean(jnp.square(p1 - g1), axis=1)
            self.data["MF_MSE"] = np.stack(
                [np.asarray(mse2), np.asarray(mse1)], axis=1
            )
        if bhatt:
            bh = jax.vmap(F.bhattacharyya)
            d2, c2 = bh(g2, p2)
            d1, c1 = bh(g1, p1)
            self.data["MF_BHATT_DIST"] = np.stack(
                [np.asarray(d2), np.asarray(d1)], axis=1
            )
            self.data["MF_BHATT_COEF"] = np.stack(
                [np.asarray(c2), np.asarray(c1)], axis=1
            )

    def compute_energy(self, chunk: int):
        factor = jnp.asarray(
            list(self.params.PRED_MPROPS_FACTOR), jnp.float32
        )[None, None, None, None, :]
        e_pred = continuity_energy(self.pred * factor, delta_t=1.0, delta_l=1.0)
        e_gt = continuity_energy(self.gt * factor, delta_t=1.0, delta_l=1.0)
        both = np.stack([np.asarray(e_gt), np.asarray(e_pred)], axis=1)
        self.data["ENERGY"] = both
        self.data["MIN-ENERGY"] = np.asarray(
            F.chunk_reduce(jnp.asarray(both), chunk, op="min")
        )

    def compute_re_density(self, chunk: int, eps: float = 1e-6):
        re = F.re_density(self.pred, self.gt, eps)
        self.data["RE_DENSITY"] = np.asarray(re)
        self.data["MIN_RE_DENSITY"] = np.asarray(
            F.chunk_reduce(re, chunk, op="min")
        )

    def compute_tv(self):
        ot = F.tv_over_time(self.pred, self.gt)
        self.data["TV_OVER_TIME"] = _flatten_over_time(np.asarray(ot))

    # ------------------------------------------------------------------
    def _header(self, name: str) -> str:
        fixed = HEADERS.get(name)
        if fixed:
            return fixed
        if "RE_DENSITY" in name:
            return _re_header(self.pred_len, self.past_len)
        return _ot_header(self.pred_len, self.past_len)

    def save(self, run_tag: str, title: str, samples_per_batch: int) -> dict:
        """Write CSVs + metrics_files.json manifest (reference :342-358)."""
        assert self.output_dir, "output_dir required to save metrics"
        os.makedirs(self.output_dir, exist_ok=True)
        manifest = {"title": title}
        for name in HEADERS:
            data = self.data.get(name)
            if data is None:
                continue
            path = os.path.join(
                self.output_dir, f"{name}_NS{samples_per_batch}_{run_tag}.csv"
            )
            np.savetxt(
                path, data, delimiter=",", header=self._header(name),
                comments="", fmt="%.4f",
            )
            manifest[name] = path
        with open(os.path.join(self.output_dir, "metrics_files.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return manifest

    def save_boxplots(self, title: str):
        """Boxplot suite (reference :360-377); lazy import keeps matplotlib
        out of compute-only paths."""
        from crowdmod_tpu.viz import plot_metrics as pm

        pm.save_metric_boxplots(self.data, HEADERS, self.output_dir, title,
                                pred_len=self.pred_len, past_len=self.past_len)


def compute_metrics(
    engine: MetricsEngine,
    metric: str,
    chunk: int,
    *,
    eps: float = 1e-6,
    run_tag: str = "run",
    title: str = "",
    samples_per_batch: int = 0,
    save: bool = True,
    boxplots: bool = True,
) -> dict:
    """Dispatch like the reference's ``compute_metrics`` (:379-399).

    ``metric`` ∈ METRIC_CHOICES; 'ALL' runs the full suite (including ENERGY
    — the reference's 'ALLA' typo at :390 silently skipped it; divergence
    documented here).
    """
    if metric not in METRIC_CHOICES:
        raise ValueError(f"metric {metric!r} not in {METRIC_CHOICES}")
    if metric in ("PSNR", "ALL"):
        engine.compute_psnr(chunk, eps)
    if metric in ("MASK_PSNR", "ALL"):
        engine.compute_psnr(chunk, eps, masked=True)
    if metric in ("SSIM", "ALL"):
        engine.compute_ssim(chunk)
    if metric in ("MF_MSE", "MF_BHATT", "ALL"):
        engine.compute_motion_features(
            mse=metric in ("MF_MSE", "ALL"), bhatt=metric in ("MF_BHATT", "ALL")
        )
    if metric in ("ENERGY", "ALL"):
        engine.compute_energy(chunk)
    if metric in ("RE_DENSITY", "ALL"):
        engine.compute_re_density(chunk, eps)
    if metric in ("TV", "ALL"):
        engine.compute_tv()

    if save and engine.output_dir:
        engine.save(run_tag, title, samples_per_batch)
        if boxplots:
            engine.save_boxplots(title)
    return engine.data
