"""Hardware-shaped compute primitives.

  * :mod:`.attention` — torch-semantics multi-head attention (XLA path with
    an optional fused Pallas kernel behind it).
  * :mod:`.norm`      — fused GroupNorm(+SiLU) flax module.
  * :mod:`.conv3d`    — stride-1 SAME 3-D conv with selectable TPU lowerings.
  * :mod:`.pallas`    — the Pallas kernels + measured per-op routing.
"""

from crowdmod_tpu.ops.attention import MultiHeadAttention, dot_product_attention
from crowdmod_tpu.ops.conv3d import Conv3DSame, conv3d_same
from crowdmod_tpu.ops.norm import GroupNormSiLU

__all__ = [
    "MultiHeadAttention",
    "dot_product_attention",
    "Conv3DSame",
    "conv3d_same",
    "GroupNormSiLU",
]
