"""Pallas TPU kernels for the hot compute paths.

These are the framework's native layer (SURVEY.md §2.9): the reference has no
custom kernels — its "native" execution is cuDNN behind torch ops — so the
TPU build introduces its own where XLA fusion alone leaves performance on the
table:

  * :mod:`.attention`  — fused single-pass multi-head attention (QK^T →
    softmax → V entirely in VMEM; token counts ≤ 216 so no streaming needed).
  * :mod:`.groupnorm`  — fused GroupNorm(+SiLU) (one VMEM pass instead of
    XLA's separate moment/normalize sweeps over HBM).
  * :mod:`.fused_step` — fused DDPM ancestral update + guidance elementwise
    chain for the reverse-sampling scan body.

Every kernel has a jnp reference implementation used (a) as the CPU/GPU
fallback, (b) as the custom-VJP backward (so kernels are trainable), and
(c) as the parity oracle in tests.  Routing is automatic: compiled Pallas on
TPU, reference elsewhere; ``CROWDMOD_FORCE_PALLAS=interpret`` forces
interpreter-mode kernels for CI coverage.
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """→ 'compiled' | 'interpret' | 'off'."""
    forced = os.environ.get("CROWDMOD_FORCE_PALLAS", "")
    if forced in ("interpret", "compiled", "off"):
        return forced
    return "compiled" if jax.default_backend() == "tpu" else "off"


from crowdmod_tpu.ops.pallas.attention import fused_attention  # noqa: E402
from crowdmod_tpu.ops.pallas.fused_step import fused_ancestral_update  # noqa: E402
from crowdmod_tpu.ops.pallas.groupnorm import fused_group_norm  # noqa: E402

__all__ = [
    "pallas_mode",
    "fused_attention",
    "fused_group_norm",
    "fused_ancestral_update",
]
