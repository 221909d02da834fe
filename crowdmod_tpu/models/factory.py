"""Architecture registry: config node → backbone module.

Mirrors the reference's arch dispatch (``DDPM_model._get_denoiser``,
/root/reference/models/diffusion/ddpm.py:74-108 and FM_model:58-88): arch
strings ``DDPM-UNet | DDPM-DiT | FM-UNet | FM-DiT | ConvRNN`` select both the
generative family and the backbone, with hyperparameters read from the
``MODEL.{DDPM,FM,CONVRNN}.{UNET,DIT}`` config nodes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crowdmod_tpu.config import FrozenConfig
from crowdmod_tpu.models.backbones.unet3d import UNet3D

ARCHS = ("DDPM-UNet", "DDPM-DiT", "FM-UNet", "FM-DiT", "ConvRNN")


def backbone_cfg(cfg: FrozenConfig, arch: str) -> FrozenConfig:
    """Navigate to the backbone node, e.g. cfg.MODEL.DDPM.UNET."""
    family, backbone = arch.upper().split("-")
    return getattr(getattr(cfg.MODEL, family), backbone)


def build_backbone(
    cfg: FrozenConfig,
    arch: str,
    mprops_count: int = 3,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> nn.Module:
    """Instantiate the denoiser/velocity-predictor backbone for ``arch``."""
    remat = bool(cfg.get_path("TPU.REMAT", False))
    if arch in ("DDPM-UNet", "FM-UNet"):
        node = backbone_cfg(cfg, arch)
        return UNet3D(
            out_channels=mprops_count,
            num_res_blocks=node.NUM_RES_BLOCKS,
            base_channels=node.BASE_CH,
            base_channels_multiples=tuple(node.BASE_CH_MULT),
            apply_attention=tuple(node.APPLY_ATTENTION),
            dropout_rate=node.DROPOUT_RATE,
            time_multiple=node.TIME_EMB_MULT,
            condition=node.CONDITION,
            dtype=dtype,
            remat=remat,
        )
    if arch in ("DDPM-DiT", "FM-DiT"):
        # DiT family: registered in models/backbones/dit.py.
        from crowdmod_tpu.models.backbones import dit

        node = backbone_cfg(cfg, arch)
        common = dict(
            out_channels=mprops_count,
            grid_rows=cfg.MACROPROPS.ROWS,
            grid_cols=cfg.MACROPROPS.COLS,
            patch_size=node.PATCH_SIZE,
            hidden_size=node.HIDDEN_SIZE,
            depth=node.DEPTH,
            num_heads=node.NUM_HEADS,
            mlp_ratio=node.MLP_RATIO,
            dropout_rate=node.DROPOUT_RATE,
            time_multiple=node.TIME_EMB_MULT,
            dtype=dtype,
            remat=remat,
        )
        if arch == "DDPM-DiT":
            # The reference's DDPM-DiT instantiates the factorized-attention
            # V4 variant (ddpm.py:89).
            return dit.DiT4DFactorized(
                past_len=cfg.DATASET.PAST_LEN,
                future_len=cfg.DATASET.FUTURE_LEN,
                t_patch_size=node.T_PATCH_SIZE,
                condition=node.CONDITION,
                **common,
            )
        # FM-DiT uses the per-frame DiT2D (flow_matching.py:73).
        return dit.DiT2D(
            past_len=cfg.DATASET.PAST_LEN,
            future_len=cfg.DATASET.FUTURE_LEN,
            condition=node.CONDITION,
            **common,
        )
    if arch == "ConvRNN":
        from crowdmod_tpu.models.convrnn import CELLS, Forecaster

        node = cfg.MODEL.CONVRNN
        try:
            cell = CELLS[node.CELL_CLASS]
        except KeyError:
            raise ValueError(
                f"unknown cell class {node.CELL_CLASS!r}; expected {list(CELLS)}"
            )
        return Forecaster(
            out_channels=mprops_count,
            enc_hidden_channels=tuple(node.ENC_HIDDEN_CH),
            forc_hidden_channels=tuple(node.FORC_HIDDEN_CH),
            enc_kernels=tuple(node.ENC_KERNELS),
            forc_kernels=tuple(node.FORC_KERNELS),
            cell=cell,
            dtype=dtype,
        )
    raise ValueError(f"unknown arch {arch!r}; expected one of {ARCHS}")
