"""3-D convolution with selectable TPU lowerings.

All stride-1 SAME 3×3×3 convolutions in the UNet go through
:class:`Conv3DSame`, which keeps one canonical parameter layout
(``kernel (3, 3, 3, Cin, Cout)``, ``bias (Cout,)`` — identical to
``flax.linen.Conv``) but offers three mathematically identical lowerings:

  * ``direct``  — XLA's native NDHWC 3-D convolution.
  * ``split_t`` — Σ_kt conv2d(shift_t(x, kt), kernel[kt]): three 2-D convs
    over the (B·T, H, W, C) view.  On TPU, 2-D convs tile onto the MXU more
    efficiently than the 3-D path for small grids.
  * ``fold_t``  — gather the (t−1, t, t+1) frames into channels and run ONE
    2-D conv with 3·Cin input features: the biggest single GEMM.

The default comes from ``CROWDMOD_CONV3D_IMPL`` (else ``direct``), so the
bench can pick the measured-fastest lowering per hardware without touching
checkpoints — the parameters are shared across implementations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

IMPLS = ("direct", "split_t", "fold_t", "pallas", "pallas_tap")


def default_impl() -> str:
    impl = os.environ.get("CROWDMOD_CONV3D_IMPL", "direct")
    if impl not in IMPLS:
        raise ValueError(
            f"CROWDMOD_CONV3D_IMPL={impl!r} is not one of {IMPLS} — refusing "
            "to silently fall back to 'direct' (a typo here would mislabel "
            "benchmark results)"
        )
    return impl


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3d_pallas(x, kernel, variant):
    from crowdmod_tpu.ops.pallas.conv3d import (
        conv3d_same_im2col,
        conv3d_same_tapgemm,
    )

    fn = conv3d_same_im2col if variant == "pallas" else conv3d_same_tapgemm
    return fn(x, kernel, compute_dtype=x.dtype)


def _conv3d_pallas_fwd(x, kernel, variant):
    return _conv3d_pallas(x, kernel, variant), (x, kernel)


def _conv3d_pallas_bwd(variant, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda xx, kk: conv3d_same(xx, kk, "direct"), x, kernel)
    return vjp(g)


_conv3d_pallas.defvjp(_conv3d_pallas_fwd, _conv3d_pallas_bwd)


def conv3d_same(x: jnp.ndarray, kernel: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Stride-1 SAME 3-D conv over ``(B, T, H, W, Cin)`` with kernel
    ``(3, 3, 3, Cin, Cout)``; returns ``(B, T, H, W, Cout)``."""
    b, t, h, w, _ = x.shape
    cout = kernel.shape[-1]
    if impl == "direct":
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    if impl in ("pallas", "pallas_tap"):
        # Weight-resident Pallas GEMMs (ops/pallas/conv3d.py): K = 27·Cin
        # fills the MXU's systolic depth that the native conv leaves 3/4
        # idle at Cin = 32.  The kernels are forward-only; the custom VJP
        # below differentiates through the math-identical direct conv so
        # `crowdmod train` under CROWDMOD_CONV3D_IMPL=pallas still works.
        return _conv3d_pallas(x, kernel, impl)

    conv2d = lambda x2, k2: jax.lax.conv_general_dilated(
        x2, k2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if impl == "split_t":
        out = None
        for kt in range(3):
            xs = xp[:, kt : kt + t].reshape(b * t, h, w, -1)
            y = conv2d(xs, kernel[kt])
            out = y if out is None else out + y
        return out.reshape(b, t, h, w, cout)

    if impl == "fold_t":
        stacked = jnp.concatenate(
            [xp[:, kt : kt + t] for kt in range(3)], axis=-1
        ).reshape(b * t, h, w, -1)
        kf = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=2)
        return conv2d(stacked, kf).reshape(b, t, h, w, cout)

    raise ValueError(f"unknown conv3d impl {impl!r}; expected {IMPLS}")


class Conv3DSame(nn.Module):
    """Stride-1 SAME 3×3×3 conv with a selectable TPU lowering.

    Parameter-compatible with ``nn.Conv(features, (3, 3, 3), "SAME")``.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    impl: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        impl = self.impl or default_impl()
        y = conv3d_same(x.astype(self.dtype), kernel.astype(self.dtype), impl)
        return y + bias.astype(self.dtype)
