from crowdmod_tpu.models.backbones.unet3d import UNet3D
from crowdmod_tpu.models.backbones.embeddings import TimestepEmbedding
from crowdmod_tpu.models.backbones.dit import (
    DiT2D,
    DiT4DTube,
    DiT4DJoint,
    DiT4DFactorized,
)

__all__ = [
    "UNet3D",
    "TimestepEmbedding",
    "DiT2D",
    "DiT4DTube",
    "DiT4DJoint",
    "DiT4DFactorized",
]
