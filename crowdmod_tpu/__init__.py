"""crowdmod_tpu — a TPU-native crowd macroproperty modeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch project ``marcemq/crowdmod-ddpm-4D``: crowd macroproperties (density,
mean velocity, velocity-norm variance) on spatial grids over time, learned
with DDPM diffusion, flow matching, and ConvRNN model families.

Design stance (see SURVEY.md §7):
  * arrays are channels-last ``(B, T, H, W, C)`` — the native TPU conv layout;
  * all hot paths (train step, reverse samplers) are single jitted functions,
    with the multi-hundred-step samplers expressed as ``lax.scan``;
  * randomness is explicit ``jax.random`` key threading;
  * multi-chip scale-out is ``jax.sharding.Mesh`` + NamedSharding (data
    parallel over batch, optional model-parallel channel sharding).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Deploy hosts may install a site hook that registers an out-of-tree
    # PJRT backend and sets ``jax.config.jax_platforms`` at interpreter
    # start, which silently overrides the JAX_PLATFORMS environment variable
    # a caller (or the test harness, for its CLI subprocesses) set.
    # Re-assert the env var so platform selection behaves as documented:
    # ``JAX_PLATFORMS=cpu crowdmod ...`` must mean CPU.
    import jax as _jax

    if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from crowdmod_tpu.core import layout, schedule  # noqa: F401
