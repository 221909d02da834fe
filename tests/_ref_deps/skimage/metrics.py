"""`structural_similarity` per Wang et al. 2004, with scikit-image's
documented defaults for 2-D float input: uniform (not gaussian) window of
size 7, sample-covariance normalization N/(N-1), and the mean taken over
the valid region after cropping the filter radius.

The reference calls it only as ``ssim(gt_2d, pred_2d, data_range=r)``
(metricsGenerator.py:207-210).
"""

import numpy as np
from scipy.ndimage import uniform_filter


def structural_similarity(im1, im2, *, data_range=None, win_size=7,
                          K1=0.01, K2=0.03):
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    if im1.shape != im2.shape:
        raise ValueError("input images must have the same shape")
    if data_range is None:
        raise ValueError("data_range must be specified for float images")
    if win_size % 2 != 1:
        raise ValueError("win_size must be odd")
    if min(im1.shape) < win_size:
        raise ValueError("win_size exceeds image extent")

    npix = win_size ** im1.ndim
    cov_norm = npix / (npix - 1)  # sample covariance

    ux = uniform_filter(im1, size=win_size)
    uy = uniform_filter(im2, size=win_size)
    uxx = uniform_filter(im1 * im1, size=win_size)
    uyy = uniform_filter(im2 * im2, size=win_size)
    uxy = uniform_filter(im1 * im2, size=win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    inner = s[tuple(slice(pad, d - pad) for d in s.shape)]
    return inner.mean(dtype=np.float64)
