"""Device mesh and sharding helpers.

The reference is strictly single-device (SURVEY.md §2.9); the scale-out story
here is built TPU-first: a 2-D ``Mesh`` with axes ``("data", "model")``.
Batch-dim data parallelism over "data" is the profitable axis at reference
model scale (few-M-param UNet/DiT on 12×36 grids) — gradient all-reduce rides
ICI and is inserted by XLA from the sharding annotations alone.  The "model"
axis is used by the DiT tensor-parallel param rules
(:mod:`crowdmod_tpu.parallel.sharding`) and defaults to size 1 on small hosts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None, model: int = 1, *, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.
    """
    explicit = devices is not None
    devices = list(devices if explicit else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    if not explicit and data * model == n:
        # ICI-aware assignment on real pods: lay the mesh out so that the
        # "model" axis (all-gather/reduce-scatter per layer) maps to
        # physically adjacent chips on the torus, instead of reshaping the
        # arbitrary enumeration order.  Falls back below for device subsets
        # (mesh_utils requires all devices) and exotic topologies.
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((data, model), devices)
            return Mesh(grid, axis_names=("data", "model"))
        except (ValueError, NotImplementedError, AssertionError):
            pass
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def mesh_from_config(cfg, model_override: int | None = None) -> Mesh:
    """Build the mesh described by the config's ``TPU.MESH`` node.

    ``MESH.DATA = -1`` (the default) puts all remaining devices on the data
    axis; ``MESH.MODEL`` sets the tensor-parallel axis size.
    ``model_override`` (e.g. a ``--model-parallel`` CLI flag) wins over the
    config value.
    """
    model = int(
        model_override if model_override is not None
        else cfg.get_path("TPU.MESH.MODEL", 1)
    )
    data = int(cfg.get_path("TPU.MESH.DATA", -1))
    return make_mesh(data=None if data <= 0 else data, model=max(model, 1))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of batch arrays with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
