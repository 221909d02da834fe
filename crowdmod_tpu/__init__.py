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

from crowdmod_tpu.core import layout, schedule  # noqa: F401
