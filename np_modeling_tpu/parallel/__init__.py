"""Parallelism: mesh construction + sharding rules (dp/tp/sp over ICI)."""

from np_modeling_tpu.parallel.mesh import auto_mesh, make_mesh
from np_modeling_tpu.parallel.sharding import (TRANSFORMER_RULES, constrain,
                                               partition_specs, shard_batch,
                                               shard_params)

__all__ = [
    "TRANSFORMER_RULES", "auto_mesh", "constrain", "make_mesh",
    "partition_specs", "shard_batch", "shard_params",
]
