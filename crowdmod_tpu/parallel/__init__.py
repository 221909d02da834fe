from crowdmod_tpu.parallel import multiprocess
from crowdmod_tpu.parallel.mesh import (
    make_mesh, mesh_from_config, shard_batch, replicate,
)
from crowdmod_tpu.parallel.sharding import fsdp_spec, param_spec, shard_params

__all__ = [
    "make_mesh", "mesh_from_config", "shard_batch", "replicate",
    "fsdp_spec", "param_spec", "shard_params", "multiprocess",
]
