"""Vectorized fidelity metrics, fully on-device.

Rebuild of /root/reference/utils/metrics/metricsGenerator.py — where the
reference iterates nested Python loops over samples × frames × channels on
CPU numpy (SURVEY.md §3.3 "CPU-bound"), every metric here is one vmapped /
batched jnp expression over the whole ``(N, F, H, W, C)`` stack:

  * PSNR / masked PSNR        (metricsGenerator.py:70-86, 120-186)
  * SSIM (skimage-semantics)  (:188-238 — 7×7 uniform window, unbiased cov,
                               edge crop; validated against a scipy oracle
                               because scikit-image is not in this image)
  * total variation           (:88-92, 321-339)
  * relative total-density    (:293-319)
  * continuity energy         (:260-291, via models.guidance)
  * motion-feature histograms (motionFeatureExtractor.py — bucketized
                               segment-sums instead of per-volume np loops)
  * Bhattacharyya dist/coef   (motionFeatureExtractor.py:286-303)

Layout: ``pred/gt`` are ``(N, F, H, W, C)`` with C = 3 (rho, vx, vy).
"over time" matrices use the reference's column order ``ch-within-frame``:
column ``j*C + c`` is channel c of frame j.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Ranges
# --------------------------------------------------------------------------

def channel_ranges(gt: jnp.ndarray) -> jnp.ndarray:
    """Global per-channel (max - min) over all GT samples → ``(C,)``."""
    axes = tuple(range(gt.ndim - 1))
    return jnp.max(gt, axis=axes) - jnp.min(gt, axis=axes)


# --------------------------------------------------------------------------
# PSNR
# --------------------------------------------------------------------------

def _psnr_from_err(err: jnp.ndarray, data_range: jnp.ndarray, eps: float):
    err = jnp.maximum(err, eps)
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(err)


def psnr_over_time(
    pred: jnp.ndarray, gt: jnp.ndarray, ranges: jnp.ndarray,
    eps: float = 1e-6, masked: bool = False, mask_threshold: float = 1e-5,
) -> jnp.ndarray:
    """Per-frame per-channel PSNR → ``(N, F, C)``.

    ``masked=True`` restricts the MSE to cells where the GT density exceeds
    ``mask_threshold`` (reference :81-86, 142); empty masks yield NaN,
    matching numpy's mean-of-empty.
    """
    sq = jnp.square(gt - pred)  # (N, F, H, W, C)
    if masked:
        mask = (gt[..., 0] > mask_threshold)[..., None]  # (N, F, H, W, 1)
        count = jnp.sum(mask, axis=(2, 3))
        err = jnp.sum(sq * mask, axis=(2, 3)) / count  # NaN when count == 0
    else:
        err = jnp.mean(sq, axis=(2, 3))
    return _psnr_from_err(err, ranges[None, None, :], eps)


# --------------------------------------------------------------------------
# SSIM (scikit-image default semantics)
# --------------------------------------------------------------------------

def _uniform_filter_2d(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """scipy.ndimage.uniform_filter (mode='reflect') over the last 2 dims."""
    pad = win // 2
    # 'SYMMETRIC' == ndimage 'reflect' (edge pixel included).
    padded = jnp.pad(
        x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)], mode="symmetric"
    )
    # Separable box filter as two cumulative-sum moving averages.
    def avg(axis, arr):
        arr = jnp.moveaxis(arr, axis, -1)
        n = arr.shape[-1]
        csum = jnp.cumsum(
            jnp.concatenate([jnp.zeros(arr.shape[:-1] + (1,), arr.dtype), arr], -1),
            axis=-1,
        )
        res = (csum[..., win:] - csum[..., : n - win + 1]) / win
        return jnp.moveaxis(res, -1, axis)

    return avg(-1, avg(-2, padded))


def ssim_frame(
    gt: jnp.ndarray, pred: jnp.ndarray, data_range: jnp.ndarray, win: int = 7
) -> jnp.ndarray:
    """SSIM of one (or a batch of) 2-D field(s) over the last two dims.

    Matches skimage.metrics.structural_similarity defaults: uniform 7×7
    window, K1=0.01 / K2=0.03, unbiased covariance (N/(N-1)), and the mean
    taken over the centre region with (win//2)-pixel edges cropped.
    """
    f = partial(_uniform_filter_2d, win=win)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    ux, uy = f(gt), f(pred)
    uxx, uyy, uxy = f(gt * gt), f(pred * pred), f(gt * pred)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    dr = data_range
    c1 = (0.01 * dr) ** 2
    c2 = (0.03 * dr) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    pad = win // 2
    return jnp.mean(s[..., pad:-pad, pad:-pad], axis=(-2, -1))


def ssim_over_time(
    pred: jnp.ndarray, gt: jnp.ndarray, ranges: jnp.ndarray, win: int = 7
) -> jnp.ndarray:
    """Per-frame per-channel SSIM → ``(N, F, C)``."""
    # (N, F, H, W, C) → (N, F, C, H, W) so frames batch over leading dims.
    p = jnp.moveaxis(pred, -1, 2)
    g = jnp.moveaxis(gt, -1, 2)
    return ssim_frame(g, p, ranges[None, None, :, None, None], win=win)


# --------------------------------------------------------------------------
# Total variation / density / energy
# --------------------------------------------------------------------------

def tv_over_time(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """|TV(pred) − TV(gt)| per frame/channel → ``(N, F, C)``."""

    def tv(x):
        dr = jnp.sum(jnp.abs(jnp.diff(x, axis=2)), axis=(2, 3))
        dc = jnp.sum(jnp.abs(jnp.diff(x, axis=3)), axis=(2, 3))
        return dr + dc  # (N, F, C)

    return jnp.abs(tv(pred) - tv(gt))


def re_density(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-6):
    """Relative total-density error per frame → ``(N, F)``."""
    p = jnp.sum(pred[..., 0], axis=(2, 3))
    g = jnp.sum(gt[..., 0], axis=(2, 3))
    return jnp.abs(p - g) / (g + eps)


# --------------------------------------------------------------------------
# Chunked (repeated-past protocol) reductions
# --------------------------------------------------------------------------

def chunk_reduce(x: jnp.ndarray, chunk: int, op: str = "max") -> jnp.ndarray:
    """Reduce over groups of ``chunk`` consecutive samples (reference's
    MAX/MIN-over-repeated-past, :166-175)."""
    if x.shape[0] % chunk:
        raise ValueError(
            f"chunk_reduce: {x.shape[0]} samples is not a multiple of "
            f"chunk={chunk}; refusing to silently drop the trailing "
            f"{x.shape[0] % chunk} samples from the MAX/MIN aggregate"
        )
    n = x.shape[0] // chunk
    grouped = x.reshape((n, chunk) + x.shape[1:])
    return jnp.max(grouped, axis=1) if op == "max" else jnp.min(grouped, axis=1)


# --------------------------------------------------------------------------
# Motion features
# --------------------------------------------------------------------------

def _minmax_per_cell(mag: jnp.ndarray, lo: float = 0.0, hi: float = 255.0):
    """MinMaxScaler semantics on a (F, N) matrix: each *column* (grid cell's
    time series) is scaled independently to [0, 255]
    (motionFeatureExtractor.py:19,53 — scaler fits per feature/column)."""
    mn = jnp.min(mag, axis=0, keepdims=True)
    mx = jnp.max(mag, axis=0, keepdims=True)
    scale = jnp.where(mx > mn, (hi - lo) / (mx - mn), 1.0)
    return (mag - mn) * scale + lo


def magnitude_angle(seq: jnp.ndarray):
    """``(F, H, W, C)`` → transformed magnitude + angle, each ``(F, H, W)``.

    magnitude: |v| → per-cell min-max to [0,255] → log2(x+1) ∈ [0, 8]
    (motionFeatureExtractor.py:48-58); angle: atan2(vy, vx).
    """
    f, h, w, _ = seq.shape
    vx, vy = seq[..., 1], seq[..., 2]
    mag = jnp.sqrt(vx * vx + vy * vy).reshape(f, h * w)
    mag = jnp.log2(_minmax_per_cell(mag) + 1.0).reshape(f, h, w)
    angle = jnp.arctan2(vy, vx)
    return mag, angle


def _volumes(x: jnp.ndarray, f: int, k: int) -> jnp.ndarray:
    """Partition ``(F, H, W)`` into (f, k, k) volumes → ``(V, f*k*k)``.

    Requires F % f == H % k == W % k == 0 (true for the bundled geometries
    with the config's f=1, k=4 on 12×36 etc.; reference silently truncates
    ragged edges via slicing — we require clean tiling).
    """
    F, H, W = x.shape
    x = x.reshape(F // f, f, H // k, k, W // k, k)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(-1, f * k * k)


def motion_feature_2d(
    seq: jnp.ndarray, f: int = 1, k: int = 4,
    mag_bins: int = 16, angle_bins: int = 16,
) -> jnp.ndarray:
    """Per-sequence 2-D (magnitude × angle) histogram feature vector.

    One bucketize + one scatter-add per sequence replaces the reference's
    per-volume ``np.histogram2d`` loop; includes the zero-angle collapse of
    the smallest-magnitude row (motionFeatureExtractor.py:139-145).
    Returns the (sum+1)-normalized concatenated vector.
    """
    mag, angle = magnitude_angle(seq)
    mv = _volumes(mag, f, k)     # (V, S)
    av = _volumes(angle, f, k)
    v = mv.shape[0]

    # np.histogram2d semantics on fixed ranges: values outside are dropped;
    # the right edge of the last bin is inclusive.
    def bucket(x, lo, hi, nbins):
        idx = jnp.floor((x - lo) / (hi - lo) * nbins).astype(jnp.int32)
        idx = jnp.where(x == hi, nbins - 1, idx)
        valid = (x >= lo) & (x <= hi)
        return idx, valid

    mi, mvalid = bucket(mv, 0.0, 8.0, mag_bins)
    ai, avalid = bucket(av, -jnp.pi, jnp.pi, angle_bins)
    valid = mvalid & avalid
    flat_bin = mi * angle_bins + ai
    vol_ids = jnp.broadcast_to(jnp.arange(v)[:, None], mv.shape)
    idx = vol_ids * (mag_bins * angle_bins) + flat_bin
    hist = jnp.zeros((v * mag_bins * angle_bins,), mv.dtype).at[
        jnp.where(valid, idx, 0)
    ].add(jnp.where(valid, 1.0, 0.0))
    hist = hist.reshape(v, mag_bins, angle_bins)

    # Zero-angle collapse: move all lowest-magnitude counts to angle bin
    # angle_bins//2 (reference set_zero_angle_to_smallMag).
    first_row_total = jnp.sum(hist[:, 0, :], axis=-1)
    hist = hist.at[:, 0, :].set(0.0)
    hist = hist.at[:, 0, angle_bins // 2].set(first_row_total)

    vec = hist.reshape(-1)
    return vec / (jnp.sum(vec) + 1.0)


def motion_feature_1d(
    seq: jnp.ndarray, f: int = 1, k: int = 4,
    angle_bins: int = 16, gamma: float = 0.5,
) -> jnp.ndarray:
    """Per-sequence 1-D angle histogram weighted by magnitude^gamma
    (motionFeatureExtractor.py:91-127), vectorized with a scatter-add.

    np.digitize semantics: angle == +pi lands past the last bin and is
    dropped, as in the reference.
    """
    mag, angle = magnitude_angle(seq)
    mv = _volumes(mag, f, k)
    av = _volumes(angle, f, k)
    v = mv.shape[0]

    edges = jnp.linspace(-jnp.pi, jnp.pi, angle_bins + 1)
    bins = jnp.searchsorted(edges, av, side="right") - 1  # == np.digitize - 1
    valid = (bins >= 0) & (bins < angle_bins)
    vol_ids = jnp.broadcast_to(jnp.arange(v)[:, None], mv.shape)
    idx = vol_ids * angle_bins + bins
    weights = jnp.where(valid, jnp.power(mv, gamma), 0.0)
    hist = jnp.zeros((v * angle_bins,), mv.dtype).at[
        jnp.where(valid, idx, 0)
    ].add(weights)
    vec = hist.reshape(-1)
    return vec / (jnp.sum(vec) + 1.0)


def bhattacharyya(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-2):
    """Bhattacharyya (distance, coefficient) between discrete distributions
    (motionFeatureExtractor.py:286-303, incl. the 1e-2 clip)."""
    coef = jnp.clip(jnp.sum(jnp.sqrt(p * q)), eps, 1.0)
    return -jnp.log(coef), coef


def mse_vec(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))
