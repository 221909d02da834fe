"""Route UNet3D ResnetBlocks through the fused weight-stationary kernel.

:func:`fused_unet_apply` runs an ordinary ``model.apply`` under a flax method
interceptor that redirects eligible ``ResnetBlock3D.__call__``s to
:func:`crowdmod_tpu.ops.pallas.fused_resblock` (ops/pallas/resblock.py),
reading the block's own bound variables — so the parameter tree, checkpoint
format, and every other layer of the model are untouched, and ineligible
blocks (attention epilogue, training-mode dropout, odd channel counts) fall
through to the normal path.

Eligibility is volume-gated: the kernel wins where the XLA path is bound by
narrow-channel conv scheduling over the FULL grid volume (the level-0 blocks
that dominate the DDPM-UNet sampler, PERF.md); at the small deep-level
volumes per-kernel overhead loses to XLA, so those stay on the default path.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.models.backbones.unet3d import ResnetBlock3D
from crowdmod_tpu.ops.pallas.resblock import fused_resblock

# Minimum (T·H·W) volume routed to the kernel: level-0 of the canonical ATC
# geometry is 8·12·36 = 3456; one downsample divides it by 8.  Measured on
# v5e (PERF.md round 3): the kernel wins at full volume and loses at
# one-eighth volume, so the gate sits between them.
MIN_FUSED_VOLUME = 1024


def _eligible(mod: ResnetBlock3D, x, deterministic: bool) -> bool:
    if not deterministic or mod.apply_attention:
        return False
    cin = x.shape[-1]
    cout = mod.out_channels
    if cin % 8 or cout % 8 or x.ndim != 5:
        return False
    t, h, w = x.shape[1:4]
    return t * h * w >= MIN_FUSED_VOLUME


def _weights_from_params(p: dict, has_skip: bool) -> dict:
    w = {
        "gn1_scale": p["GroupNormSiLU_0"]["scale"],
        "gn1_bias": p["GroupNormSiLU_0"]["bias"],
        "w1": p["conv1"]["kernel"],
        "b1": p["conv1"]["bias"],
        "gn2_scale": p["GroupNormSiLU_1"]["scale"],
        "gn2_bias": p["GroupNormSiLU_1"]["bias"],
        "w2": p["conv2"]["kernel"],
        "b2": p["conv2"]["bias"],
    }
    if has_skip:
        w["w_skip"] = p["match_input"]["kernel"]
        w["b_skip"] = p["match_input"]["bias"]
    return w


def make_resblock_interceptor(mode: str | None = None):
    """flax method interceptor routing eligible resblocks to the kernel."""

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            not isinstance(mod, ResnetBlock3D)
            or context.method_name != "__call__"
        ):
            return next_fn(*args, **kwargs)
        x, temb = args[0], args[1]
        deterministic = (
            args[2] if len(args) > 2 else kwargs.get("deterministic", True)
        )
        if not _eligible(mod, x, deterministic):
            return next_fn(*args, **kwargs)
        p = mod.variables["params"]
        has_skip = x.shape[-1] != mod.out_channels
        w = _weights_from_params(p, has_skip)
        dt = mod.dtype
        temb_proj = (
            nn.silu(temb.astype(dt)) @ p["time_dense"]["kernel"].astype(dt)
            + p["time_dense"]["bias"].astype(dt)
        )
        return fused_resblock(
            x.astype(dt), temb_proj, w, num_groups=8, eps=1e-5, mode=mode,
        )

    return interceptor


def fused_unet_apply(model, variables, future, t, past, *, mode=None):
    """``model.apply`` with eligible resblocks running the fused kernel.

    Deterministic (sampler) path only — training calls fall through inside
    the interceptor anyway, but use plain ``model.apply`` there.
    """
    with nn.intercept_methods(make_resblock_interceptor(mode)):
        return model.apply(variables, future, t, past, deterministic=True)
