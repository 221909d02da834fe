"""Metric parity tests against independent numpy oracles that follow the
reference algorithms (metricsGenerator.py / motionFeatureExtractor.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from crowdmod_tpu.metrics import functional as F
from crowdmod_tpu.metrics.generator import MetricsEngine, compute_metrics

N, Fr, H, W, C = 8, 3, 12, 36, 3
CHUNK = 4

rng = np.random.default_rng(0)


@pytest.fixture(scope="module")
def stacks():
    gt = rng.normal(size=(N, Fr, H, W, C)).astype(np.float32)
    gt[..., 0] = np.abs(gt[..., 0]) * 2
    pred = gt + 0.1 * rng.normal(size=gt.shape).astype(np.float32)
    return jnp.asarray(pred), jnp.asarray(gt)


def _oracle_psnr(gt2d, pred2d, dr, eps=1e-6, mask=None):
    if mask is not None:
        err = np.mean((gt2d[mask] - pred2d[mask]) ** 2, dtype=np.float64)
    else:
        err = np.mean((gt2d - pred2d) ** 2, dtype=np.float64)
    err = max(err, eps)
    return 20 * np.log10(dr) - 10 * np.log10(err)


def test_psnr_matches_oracle(stacks):
    pred, gt = stacks
    ranges = np.asarray(F.channel_ranges(gt))
    ours = np.asarray(F.psnr_over_time(pred, gt, jnp.asarray(ranges)))
    for i in [0, 5]:
        for j in range(Fr):
            for c in range(C):
                want = _oracle_psnr(
                    np.asarray(gt)[i, j, :, :, c],
                    np.asarray(pred)[i, j, :, :, c],
                    ranges[c],
                )
                np.testing.assert_allclose(ours[i, j, c], want, rtol=1e-4)


def test_masked_psnr_matches_oracle(stacks):
    pred, gt = stacks
    ranges = np.asarray(F.channel_ranges(gt))
    ours = np.asarray(
        F.psnr_over_time(pred, gt, jnp.asarray(ranges), masked=True)
    )
    g, p = np.asarray(gt), np.asarray(pred)
    mask = g[0, 0, :, :, 0] > 1e-5
    want = _oracle_psnr(g[0, 0, :, :, 1], p[0, 0, :, :, 1], ranges[1], mask=mask)
    np.testing.assert_allclose(ours[0, 0, 1], want, rtol=1e-4)


def _oracle_ssim(x, y, dr, win=7):
    """skimage.structural_similarity defaults via scipy uniform_filter."""
    f = lambda a: ndi.uniform_filter(a.astype(np.float64), size=win)
    npx = win * win
    cov_norm = npx / (npx - 1)
    ux, uy = f(x), f(y)
    vx = cov_norm * (f(x * x) - ux * ux)
    vy = cov_norm * (f(y * y) - uy * uy)
    vxy = cov_norm * (f(x * y) - ux * uy)
    c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    pad = win // 2
    return s[pad:-pad, pad:-pad].mean()


def test_ssim_matches_skimage_semantics(stacks):
    pred, gt = stacks
    ranges = np.asarray(F.channel_ranges(gt))
    ours = np.asarray(F.ssim_over_time(pred, gt, jnp.asarray(ranges)))
    g, p = np.asarray(gt), np.asarray(pred)
    for (i, j, c) in [(0, 0, 0), (3, 2, 1), (7, 1, 2)]:
        want = _oracle_ssim(g[i, j, :, :, c], p[i, j, :, :, c], ranges[c])
        np.testing.assert_allclose(ours[i, j, c], want, rtol=1e-4)
    # Identical inputs → SSIM 1.
    ones = np.asarray(F.ssim_over_time(gt, gt, jnp.asarray(ranges)))
    np.testing.assert_allclose(ones, 1.0, atol=1e-5)


def test_tv_matches_oracle(stacks):
    pred, gt = stacks
    ours = np.asarray(F.tv_over_time(pred, gt))
    g, p = np.asarray(gt), np.asarray(pred)

    def tv(a):
        return np.abs(np.diff(a, axis=0)).sum() + np.abs(np.diff(a, axis=1)).sum()

    want = abs(tv(p[2, 1, :, :, 0]) - tv(g[2, 1, :, :, 0]))
    np.testing.assert_allclose(ours[2, 1, 0], want, rtol=1e-4)


def test_re_density_and_chunk(stacks):
    pred, gt = stacks
    re = np.asarray(F.re_density(pred, gt))
    g, p = np.asarray(gt), np.asarray(pred)
    want = abs(p[1, 2, :, :, 0].sum() - g[1, 2, :, :, 0].sum()) / (
        g[1, 2, :, :, 0].sum() + 1e-6
    )
    np.testing.assert_allclose(re[1, 2], want, rtol=5e-4)
    mn = np.asarray(F.chunk_reduce(jnp.asarray(re), CHUNK, op="min"))
    assert mn.shape == (N // CHUNK, Fr)
    np.testing.assert_allclose(mn[0], re[:CHUNK].min(axis=0), rtol=1e-6)


def _oracle_mf2d(seq, f=1, k=4, mb=16, ab=16):
    """Reference motion_feature_2D pipeline in plain numpy (channel-first
    seq (C, H, W, F) like the reference's tensors)."""
    from sklearn.preprocessing import MinMaxScaler

    c, r, cc, F_ = seq.shape
    n = r * cc
    vx = seq[1].reshape(n, F_).T
    vy = seq[2].reshape(n, F_).T
    mag = np.sqrt(vx**2 + vy**2)
    mag = MinMaxScaler((0, 255)).fit_transform(mag)
    mag = np.log2(mag + 1).reshape(F_, r, cc)
    ang = np.arctan2(vy, vx).reshape(F_, r, cc)
    vec = []
    for i in range(0, F_, f):
        for row in range(0, r, k):
            for col in range(0, cc, k):
                mv = mag[i : i + f, row : row + k, col : col + k].ravel()
                av = ang[i : i + f, row : row + k, col : col + k].ravel()
                h2, _, _ = np.histogram2d(
                    mv, av, bins=[mb, ab], range=[[0, 8.0], [-np.pi, np.pi]]
                )
                tot = h2[0, :].sum()
                h2[0, :] = 0
                h2[0, ab // 2] = tot
                vec.append(h2.ravel())
    v = np.concatenate(vec)
    return v / (v.sum() + 1)


def test_motion_feature_2d_parity(stacks):
    # Run under x64 so bin-edge decisions match the float64 numpy oracle.
    pred, _ = stacks
    seq = np.asarray(pred)[0].astype(np.float64)  # (F, H, W, C)
    with jax.enable_x64():
        ours = np.asarray(F.motion_feature_2d(jnp.asarray(seq)))
    want = _oracle_mf2d(np.transpose(seq, (3, 1, 2, 0)))
    np.testing.assert_allclose(ours, want, atol=1e-9)


def _oracle_mf1d(seq, f=1, k=4, ab=16, gamma=0.5):
    from sklearn.preprocessing import MinMaxScaler

    c, r, cc, F_ = seq.shape
    n = r * cc
    vx = seq[1].reshape(n, F_).T
    vy = seq[2].reshape(n, F_).T
    mag = np.sqrt(vx**2 + vy**2)
    mag = MinMaxScaler((0, 255)).fit_transform(mag)
    mag = np.log2(mag + 1).reshape(F_, r, cc)
    ang = np.arctan2(vy, vx).reshape(F_, r, cc)
    vec = []
    for i in range(0, F_, f):
        for row in range(0, r, k):
            for col in range(0, cc, k):
                mv = mag[i : i + f, row : row + k, col : col + k].ravel()
                av = ang[i : i + f, row : row + k, col : col + k].ravel()
                bins = np.digitize(av, np.linspace(-np.pi, np.pi, ab + 1)) - 1
                h1 = np.zeros(ab)
                for b in range(ab):
                    h1[b] = np.sum(np.power(mv[bins == b], gamma))
                vec.append(h1)
    v = np.concatenate(vec)
    return v / (v.sum() + 1)


def test_motion_feature_1d_parity(stacks):
    pred, _ = stacks
    seq = np.asarray(pred)[0].astype(np.float64)
    with jax.enable_x64():
        ours = np.asarray(F.motion_feature_1d(jnp.asarray(seq)))
    want = _oracle_mf1d(np.transpose(seq, (3, 1, 2, 0)))
    np.testing.assert_allclose(ours, want, atol=1e-9)


def test_bhattacharyya():
    p = np.array([0.5, 0.5, 0.0])
    d, c = F.bhattacharyya(jnp.asarray(p), jnp.asarray(p))
    np.testing.assert_allclose(float(c), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(d), 0.0, atol=1e-6)
    q = np.array([0.0, 0.0, 1.0])
    d2, c2 = F.bhattacharyya(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(float(c2), 1e-2, atol=1e-8)  # clipped


def test_engine_end_to_end(stacks, tmp_path, atc_cfg):
    pred, gt = stacks
    eng = MetricsEngine(pred, gt, atc_cfg.METRICS, output_dir=str(tmp_path))
    data = compute_metrics(
        eng, "ALL", CHUNK, run_tag="TE200_PL5_FL3_CE000_NA",
        title="unit", samples_per_batch=N, boxplots=True,
    )
    for key in ["PSNR", "MASK_PSNR", "SSIM", "MAX_SSIM", "MF_MSE",
                "MF_BHATT_DIST", "ENERGY", "RE_DENSITY", "TV_OVER_TIME"]:
        assert data.get(key) is not None, key
    manifest = json.loads((tmp_path / "metrics_files.json").read_text())
    assert "PSNR" in manifest
    csv = (tmp_path / "PSNR_NS8_TE200_PL5_FL3_CE000_NA.csv").read_text()
    assert csv.startswith("rho,vx,vy")
    assert (tmp_path / "BP_PSNR.png").exists()
    assert (tmp_path / "BP_RE_DENSITY.png").exists()
