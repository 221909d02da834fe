"""Parameter sharding rules for the ("data", "model") mesh.

At reference scale (≤ ~10M params) full replication is usually optimal, but
the framework supports genuine tensor parallelism: kernels whose output
feature dim divides the "model" axis and whose size crosses a threshold are
sharded on that dim — XLA then partitions the matmul/conv and inserts the
reduce-scatter/all-gather collectives over ICI automatically.

For models that outgrow per-chip HBM, ``mode="fsdp"`` additionally shards
parameters (and, by sharding inheritance through ``tx.init``/``jnp.copy``,
the Adam moments and EMA) over the "data" axis — ZeRO-3 semantics with zero
hand-written collectives: annotate, and XLA inserts the weight all-gathers
and gradient reduce-scatters over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(x, model_size: int, min_size: int) -> P:
    """PartitionSpec for one parameter: shard last (output-feature) dim over
    "model" when large and divisible; otherwise replicate."""
    if (
        model_size > 1
        and x.ndim >= 2
        and x.shape[-1] % model_size == 0
        and x.size >= min_size
    ):
        return P(*([None] * (x.ndim - 1)), "model")
    return P()


def fsdp_spec(
    x, data_size: int, min_size: int, model_size: int = 1
) -> P:
    """PartitionSpec for one parameter under FSDP (ZeRO-3) rules.

    Composes with the TP rule: the last dim may go to "model" (as in
    :func:`param_spec`), then the largest *remaining* dim divisible by the
    data-axis size is sharded over "data".  Each chip holds 1/data_size of
    the parameters and optimizer state; XLA all-gathers weights at use and
    reduce-scatters gradients — the standard JAX SPMD FSDP recipe (no
    hand-written collectives).  Small/indivisible tensors stay replicated.
    """
    entries: list = [None] * x.ndim
    if (
        model_size > 1
        and x.ndim >= 2
        and x.shape[-1] % model_size == 0
        and x.size >= min_size
    ):
        entries[-1] = "model"
    if data_size > 1 and x.size >= min_size:
        candidates = [
            i for i in range(x.ndim)
            if entries[i] is None and x.shape[i] % data_size == 0
        ]
        if candidates:
            entries[max(candidates, key=lambda i: x.shape[i])] = "data"
    if all(e is None for e in entries):
        return P()
    return P(*entries)


def shard_params(params, mesh: Mesh, min_size: int = 1 << 12,
                 mode: str = "tp"):
    """Place a parameter pytree on the mesh under the sharding rules.

    ``mode="tp"``   — channel-shard large kernels over "model", replicate the
                      rest (the round-1 default; right at reference scale).
    ``mode="fsdp"`` — additionally shard parameters and (by inheritance)
                      optimizer/EMA state over "data", ZeRO-3 style, for
                      models too large to replicate per chip.
    """
    model_size = mesh.shape["model"]
    if mode == "fsdp":
        data_size = mesh.shape["data"]
        spec_of = lambda x: fsdp_spec(x, data_size, min_size, model_size)
    elif mode == "tp":
        spec_of = lambda x: param_spec(x, model_size, min_size)
    else:
        raise ValueError(f"unknown param-sharding mode {mode!r}")

    def place(x):
        # Host scalars (e.g. the plateau-injected learning rate inside an
        # optimizer state) have no shape — leave them as-is; jit treats
        # them as replicated weak-typed constants.
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, NamedSharding(mesh, spec_of(x)))

    return jax.tree.map(place, params)
