"""Per-block gradient rematerialization (``jax.checkpoint``).

For training runs that are activation-memory-bound (long sequences, big
grids, deep stacks — not the reference's default scale), wrapping each
transformer/resnet block in ``nn.remat`` stores only block-boundary
activations during the forward pass and recomputes the block interior
during backward: peak activation memory drops from O(depth) blocks to
O(1) block at the cost of one extra forward per block.  Composes with
FSDP/TP sharding (``crowdmod_tpu.parallel``) — remat trades FLOPs for
HBM exactly where FSDP trades HBM for ICI traffic.

Enabled via ``TPU.REMAT: true`` in the config (plumbed through
``models.factory.build_backbone``).  Parameter structure is identical with
remat on or off; outputs/grads agree to float-fusion tolerance (the remat
region shifts XLA fusion boundaries, so bit-parity is not guaranteed).
"""

from __future__ import annotations

import flax.linen as nn


def maybe_remat(block_cls, enable: bool, *, deterministic_argnum: int = 3):
    """Return ``block_cls`` wrapped in ``nn.remat`` when ``enable``.

    ``deterministic_argnum`` is the positional index of the static
    ``deterministic`` flag in ``__call__`` (the module itself is argument 0)
    — it must be static because dropout branches on it in Python.  Call
    sites must pass it positionally when remat is on.
    """
    if not enable:
        return block_cls
    return nn.remat(block_cls, static_argnums=(deterministic_argnum,))
