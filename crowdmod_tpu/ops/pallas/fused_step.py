"""Fused DDPM ancestral-update kernel for the reverse-sampling scan body.

One reverse step is the elementwise chain (reference ddpm.py:23-38 + guidance
application :223-229):

    x' = 1/√α_t · (x − β_t/√(1−ᾱ_t) · ε̂) + √β_t · z
    x' = x' − λ·√β_t·sign(ρ-channel)          [Sparsity guidance, optional]

The scan body otherwise materializes x between each of those ops; this kernel
runs the whole chain in one VMEM pass.  The noise ``z`` is taken as an input
(generated with ``jax.random.normal`` outside) so sampling remains bit-stable
with the unfused path under a fixed PRNG key.

Sampling only runs forward, so no custom VJP is needed; a jnp reference twin
serves as fallback and test oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ancestral_update_reference(
    x, eps, z, *, inv_sqrt_alpha, beta_over_somab, sigma,
    lambda_guidance=0.0, sparsity=False, rho_channel=0,
):
    out = inv_sqrt_alpha * (x - beta_over_somab * eps) + sigma * z
    if sparsity:
        guid = jnp.zeros_like(out).at[..., rho_channel].set(
            jnp.sign(out[..., rho_channel])
        )
        out = out - lambda_guidance * sigma * guid
    return out


def _step_kernel(
    x_ref, eps_ref, z_ref, coef_ref, o_ref, *,
    lambda_guidance, sparsity, rho_channel, channels,
):
    inv_sqrt_alpha = coef_ref[0, 0]
    beta_over_somab = coef_ref[0, 1]
    sigma = coef_ref[0, 2]
    out = inv_sqrt_alpha * (x_ref[:] - beta_over_somab * eps_ref[:]) \
        + sigma * z_ref[:]
    if sparsity:
        # Blocks are (rows, W·C): the channel of lane l is l % C, so the
        # ρ-channel mask is computable without any lane reshape.
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
        guid = jnp.where(lane % channels == rho_channel, jnp.sign(out), 0.0)
        out = out - lambda_guidance * sigma * guid
    o_ref[:] = out


def fused_ancestral_update(
    x: jnp.ndarray,
    eps: jnp.ndarray,
    z: jnp.ndarray,
    *,
    inv_sqrt_alpha: jnp.ndarray,
    beta_over_somab: jnp.ndarray,
    sigma: jnp.ndarray,
    lambda_guidance: float = 0.0,
    sparsity: bool = False,
    rho_channel: int = 0,
    mode: str | None = None,
) -> jnp.ndarray:
    """One fused reverse step over ``(B, F, H, W, C)`` (any shape, really)."""
    from crowdmod_tpu.ops.pallas import pallas_mode

    mode = mode or pallas_mode("fused_step")
    if mode == "off":
        return ancestral_update_reference(
            x, eps, z,
            inv_sqrt_alpha=inv_sqrt_alpha, beta_over_somab=beta_over_somab,
            sigma=sigma, lambda_guidance=lambda_guidance, sparsity=sparsity,
            rho_channel=rho_channel,
        )
    coefs = jnp.stack([
        jnp.asarray(inv_sqrt_alpha, x.dtype),
        jnp.asarray(beta_over_somab, x.dtype),
        jnp.asarray(sigma, x.dtype),
    ]).reshape(1, 3)
    shape = x.shape
    c = shape[-1]
    # Fold W into the lane dim so tiny channel counts don't pad every
    # element's lane group 128/C-fold; tile the row dim across the grid to
    # bound VMEM (~4 buffers × block × 4 B).
    cols = shape[-2] * c if len(shape) >= 2 else c
    flat = lambda a: a.reshape(-1, cols)
    rows = flat(x).shape[0]
    block_rows = min(rows, 512)
    grid = (pl.cdiv(rows, block_rows),)
    spec = pl.BlockSpec(
        (block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        partial(
            _step_kernel,
            lambda_guidance=lambda_guidance, sparsity=sparsity,
            rho_channel=rho_channel, channels=c,
        ),
        out_shape=jax.ShapeDtypeStruct(flat(x).shape, x.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, cspec],
        out_specs=spec,
        interpret=(mode == "interpret"),
    )(flat(x), flat(eps), flat(z), coefs)
    return out.reshape(shape)
