"""Weight-resident im2col Conv3D kernel for narrow-channel UNet levels.

Why this exists (PERF.md "next lever 1"): XLA's native NDHWC Conv3D at the
reference UNet's 32-channel levels runs at ~7% of MXU peak because BOTH
systolic dimensions are underfilled — K = Cin = 32 of 128 rows and
N = Cout = 32 of 128 lanes (tile cap (32/128)² ≈ 6.25%, measured 13.6 TF/s
≈ the cap).  Expressing the conv as an explicit im2col GEMM lifts K to
27·Cin = 864 (full), leaving only the N = Cout underfill: a 4× higher
ceiling.  The patch matrix never touches HBM — it is assembled in VMEM per
grid step from the (small) padded input block, and the folded weight matrix
``(27·Cin, Cout)`` stays VMEM-resident across the grid.

Reference workload this accelerates: the per-step denoiser of
/root/reference/models/diffusion/ddpm.py:206-236 (UNet at
models/backbones/unet.py:124-167).

The kernels here define only the forward pass; ``ops/conv3d.py`` wraps them
in a custom VJP that differentiates through the math-identical direct XLA
conv, so training under ``CROWDMOD_CONV3D_IMPL=pallas`` works (the sampler
remains the hot path these kernels target).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, patches):
    """One batch element: per t-slice, assemble im2col patches in VMEM and
    run one GEMM — bounds the scratch at (H·W, 27·Cin) so wide decoder
    inputs (Cin = 96) stay inside the 16 MB VMEM budget.

    x_ref: (1, T+2, H+2, W+2, C) padded input block.
    w_ref: (27*C, Cout) folded weights, (kd, kh, kw, c) row order.
    o_ref: (1, T, H, W, Cout).
    patches: VMEM scratch (H*W, 27*C).
    """
    t, h, w = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
    c = x_ref.shape[4]
    m = h * w
    for ti in range(t):
        j = 0
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    xs = x_ref[0, ti + kd, kh : kh + h, kw : kw + w, :]
                    patches[:, j * c : (j + 1) * c] = xs.reshape(m, c)
                    j += 1
        o_ref[0, ti] = jnp.dot(
            patches[:], w_ref[:], preferred_element_type=jnp.float32
        ).reshape(h, w, -1).astype(o_ref.dtype)


def _tap_kernel(x_ref, w_ref, o_ref, acc):
    """One batch element, tap-packed shift-GEMM conv.

    No im2col copies at all: for each (kd, kh) the input slab
    ``x_ref[0, t+kd, kh:kh+H, :, :]`` is a CONTIGUOUS ``(H, W+2, C)`` block
    (trailing dims full), reshaped free of charge to ``(H·(W+2), C)`` and
    multiplied by the tap's weights with all three kw taps PACKED into the
    GEMM's N dimension (``3·Cout`` lanes — 3× the lane fill of the naive
    conv).  The kw de-shuffle is a cheap shifted accumulate on the small
    output tile.

    x_ref: (1, T+2, H+2, W+2, C);  w_ref: (9, C, 3*Cout);
    o_ref: (1, T, H, W, Cout);  acc: VMEM (H*(W+2), 3*Cout) f32 scratch.
    """
    t, h, w = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
    wp = w + 2
    c = x_ref.shape[4]
    cout = o_ref.shape[4]
    for ti in range(t):
        acc[:] = jnp.zeros_like(acc)
        for kd in range(3):
            for kh in range(3):
                slab = x_ref[0, ti + kd, kh : kh + h, :, :].reshape(h * wp, c)
                acc[:] += jnp.dot(
                    slab, w_ref[kd * 3 + kh],
                    preferred_element_type=jnp.float32,
                )
        # Keep the lane dimension whole (3*Cout) — splitting it 96→(3, 32)
        # re-tiles lanes, which Mosaic rejects; column group g is a plain
        # lane slice instead.  Output pixel w consumed padded columns
        # w, w+1, w+2 for taps g = 0, 1, 2.
        z = acc[:].reshape(h, wp, 3 * cout)
        o_ref[0, ti] = (
            z[:, 0:w, 0:cout]
            + z[:, 1 : w + 1, cout : 2 * cout]
            + z[:, 2 : w + 2, 2 * cout : 3 * cout]
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def conv3d_same_tapgemm(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3×3×3 conv via 9 tap-packed slab GEMMs per t-slice.

    Same contract as :func:`conv3d_same_im2col` but with zero patch
    materialization: K = Cin per GEMM (underfilled for narrow layers) while
    N = 3·Cout (3× the naive lane fill) and the input is read exactly once
    per (kd, kh) tap as a contiguous slab.
    """
    b, t, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))
    ).astype(compute_dtype)
    # w_taps[kd*3+kh] = [Cin, 3*Cout] with kw fastest in N blocks: the
    # GEMM's column block g holds tap (kd, kh, g)'s weights.
    w_taps = jnp.transpose(kernel, (0, 1, 3, 2, 4)).reshape(
        9, cin, 3 * cout
    ).astype(compute_dtype)

    return pl.pallas_call(
        _tap_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, t + 2, h + 2, w + 2, cin),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, h, w, cout),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h * (w + 2), 3 * cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * h * (w + 2) * 27 * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + w_taps.size * w_taps.dtype.itemsize
                + b * t * h * w * cout * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_taps)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def conv3d_same_im2col(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME 3×3×3 conv, ``(B, T, H, W, Cin) → (B, T, H, W, Cout)``.

    Math-identical to ``ops.conv3d.conv3d_same(..., impl="direct")``; layout
    and parameters identical to ``flax.linen.Conv`` (kernel
    ``(3, 3, 3, Cin, Cout)``).  ``compute_dtype=jnp.bfloat16`` halves VMEM
    and doubles MXU rate with f32 accumulation.
    """
    b, t, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))
    ).astype(compute_dtype)
    w_mat = kernel.reshape(27 * cin, cout).astype(compute_dtype)

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, t + 2, h + 2, w + 2, cin),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, h, w, cout),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h * w, 27 * cin), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * h * w * 27 * cin * cout,
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + w_mat.size * w_mat.dtype.itemsize
                + b * t * h * w * cout * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w_mat)
