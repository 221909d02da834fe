"""Parameter sharding rules for the ("data", "model") mesh.

At reference scale (≤ ~10M params) full replication is usually optimal, but
the framework supports genuine tensor parallelism: kernels whose output
feature dim divides the "model" axis and whose size crosses a threshold are
sharded on that dim — XLA then partitions the matmul/conv and inserts the
reduce-scatter/all-gather collectives over ICI automatically.
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


def shard_params(params, mesh: Mesh, min_size: int = 1 << 12):
    """Place a parameter pytree on the mesh under the TP/replication rules."""
    model_size = mesh.shape["model"]

    def place(x):
        spec = param_spec(x, model_size, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
