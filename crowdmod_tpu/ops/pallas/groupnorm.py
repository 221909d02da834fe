"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm over ``(B, T, H, W, C)`` activations is memory-bound: the unfused
path sweeps the activation from HBM once for the moments and again for the
normalization.  This kernel computes moments, normalization, affine, and the
optional SiLU in a single VMEM pass per batch element (one ATC-scale
activation is ≤ ~2 MB, far under the 16 MB VMEM budget).

Used by the UNet3D ResnetBlocks (GN(8)+SiLU pairs at unet3d.py:66,74,197 —
mirroring reference models/backbones/layers.py:31-41) via
:func:`crowdmod_tpu.ops.norm.group_norm_silu`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_reference(x, gamma, beta, num_groups, eps, silu):
    """jnp oracle, flax ``nn.GroupNorm`` semantics (biased variance, moments
    over all spatial positions and the channels within each group).

    Moments and the affine run in float32 regardless of the activation dtype
    (bf16-safe); in/out stay in the input dtype so HBM traffic doesn't
    double — XLA fuses the casts into the loads/stores.
    """
    *lead, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32)
    xg = xf.reshape(x.shape[0], -1, g, c // g)  # (B, S, G, C/G)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    norm = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = norm.reshape(x.shape) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, num_groups, eps, silu):
    """One batch element, ``(S, C)`` flattened.

    Mosaic cannot shape-cast the lane (channel) dimension into (G, C/G), so
    group moments are computed with a one-hot (C, G) membership matmul — two
    tiny MXU contractions — and broadcast back the same way.
    """
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    s, c = x.shape
    g = num_groups
    cg = c // g
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    member = (ch // cg == gr).astype(jnp.float32)  # (C, G)
    n = float(s * cg)

    to_groups = lambda a: jnp.sum(
        jnp.dot(a, member, preferred_element_type=jnp.float32),
        axis=0, keepdims=True,
    )  # (S, C) → (1, G)
    to_channels = lambda a: jax.lax.dot_general(
        a, member, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, G) → (1, C)

    mean_c = to_channels(to_groups(x) / n)
    dev = x - mean_c
    var_c = to_channels(to_groups(dev * dev) / n)
    norm = dev * jax.lax.rsqrt(var_c + eps)
    out = norm * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _gn_pallas(x2d, gamma, beta, num_groups, eps, silu, interpret):
    b, s, c = x2d.shape
    xspec = pl.BlockSpec(
        (1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_gn_kernel, num_groups=num_groups, eps=eps, silu=silu),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(b,),
        in_specs=[xspec, pspec, pspec],
        out_specs=xspec,
        interpret=interpret,
    )(x2d, gamma.reshape(1, c), beta.reshape(1, c))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(x2d, gamma, beta, num_groups, eps, silu, interpret):
    return _gn_pallas(x2d, gamma, beta, num_groups, eps, silu, interpret)


def _fused_fwd(x2d, gamma, beta, num_groups, eps, silu, interpret):
    out = _gn_pallas(x2d, gamma, beta, num_groups, eps, silu, interpret)
    return out, (x2d, gamma, beta)


def _fused_bwd(num_groups, eps, silu, interpret, res, g):
    x2d, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, ga, be: group_norm_reference(x, ga, be, num_groups, eps, silu),
        x2d, gamma, beta,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    num_groups: int = 8,
    eps: float = 1e-5,
    silu: bool = False,
    mode: str | None = None,
) -> jnp.ndarray:
    """GroupNorm(+SiLU) over channels-last ``(B, ..., C)``."""
    from crowdmod_tpu.ops.pallas import pallas_mode

    mode = mode or pallas_mode("groupnorm")
    gamma = gamma.reshape(-1)
    beta = beta.reshape(-1)
    if x.shape[-1] % num_groups:
        # The kernel's one-hot membership silently zeroes the remainder
        # channels; the reference path raises on the group reshape.  Fail
        # identically on both routings.
        raise ValueError(
            f"channels ({x.shape[-1]}) must be divisible by "
            f"num_groups ({num_groups})"
        )
    if mode == "off":
        return group_norm_reference(x, gamma, beta, num_groups, eps, silu)
    shape = x.shape
    x2d = x.reshape(shape[0], -1, shape[-1])
    out = _fused(x2d, gamma, beta, num_groups, eps, silu, mode == "interpret")
    return out.reshape(shape)
