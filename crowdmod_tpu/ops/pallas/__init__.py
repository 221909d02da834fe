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


# Measured on TPU v5e at reference scale (batch 64, ATC 12×36 grid, UNet3D
# T=1000 reverse scan): the standalone kernels LOSE to XLA's automatic fusion
# — end-to-end 6.6k steps/s with kernels vs 13.5k with XLA — because a custom
# call breaks producer/consumer fusion and forces an HBM round-trip either
# side of an op that is otherwise fused into the surrounding convs.  The
# kernels stay available (and tested) for the shape regimes where a single
# VMEM pass wins (large tokens/channels); routing is per-op so future
# hardware/shape points can flip individual defaults with one env var.
DEFAULT_MODES = {
    "attention": "off",
    "groupnorm": "off",
    "fused_step": "off",
    # Weight-stationary fused resblock (ops/pallas/resblock.py): unlike the
    # standalone kernels above it REPLACES a whole chain of XLA ops (2 GNs,
    # 2 convs, adds) rather than splitting a fusion, so the measured default
    # differs — see PERF.md round 3.
    "resblock": "off",
}


def pallas_mode(op: str | None = None) -> str:
    """→ 'compiled' | 'interpret' | 'off' for ``op``.

    Resolution order: ``CROWDMOD_FORCE_PALLAS`` (global override) →
    ``CROWDMOD_PALLAS_<OP>`` → measured per-op default.
    """
    valid = ("interpret", "compiled", "off")

    def _get(var: str) -> str:
        # A typo must raise, not silently fall through to the default —
        # that would mislabel benchmark/CI runs (same contract as
        # ops/conv3d.py's CROWDMOD_CONV3D_IMPL).
        val = os.environ.get(var, "")
        if val and val not in valid:
            raise ValueError(f"{var}={val!r}; expected one of {valid}")
        return val

    forced = _get("CROWDMOD_FORCE_PALLAS")
    if forced:
        return forced
    if op:
        per_op = _get(f"CROWDMOD_PALLAS_{op.upper()}")
        if per_op:
            return per_op
        default = DEFAULT_MODES.get(op, "off")
    else:
        default = "off"
    if default == "compiled" and jax.default_backend() != "tpu":
        return "off"
    return default


from crowdmod_tpu.ops.pallas.attention import fused_attention  # noqa: E402
from crowdmod_tpu.ops.pallas.fused_step import fused_ancestral_update  # noqa: E402
from crowdmod_tpu.ops.pallas.groupnorm import fused_group_norm  # noqa: E402
from crowdmod_tpu.ops.pallas.resblock import fused_resblock  # noqa: E402

__all__ = [
    "pallas_mode",
    "fused_attention",
    "fused_group_norm",
    "fused_ancestral_update",
    "fused_resblock",
]
