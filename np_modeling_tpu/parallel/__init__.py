"""Parallelism: mesh + sharding rules (dp/tp/sp over ICI, multihost DCN)."""

from np_modeling_tpu.parallel import multihost
from np_modeling_tpu.parallel.context import (gather_attention,
                                              make_context_parallel_attention,
                                              ring_attention)
from np_modeling_tpu.parallel.fsdp import (fsdp_opt_init, fsdp_params,
                                           fsdp_specs)
from np_modeling_tpu.parallel.mesh import auto_mesh, make_mesh
from np_modeling_tpu.parallel.pipeline import (make_pipeline, pipeline_apply,
                                               pipeline_gpt, stack_gpt_layers)
from np_modeling_tpu.parallel.zero import (zero1_init, zero1_shardings,
                                           zero1_spec)
from np_modeling_tpu.parallel.sharding import (MAMBA_RULES,
                                               TRANSFORMER_RULES, constrain,
                                               partition_specs, shard_batch,
                                               shard_params)

__all__ = [
    "MAMBA_RULES",
    "TRANSFORMER_RULES", "auto_mesh", "constrain", "fsdp_opt_init",
    "fsdp_params", "fsdp_specs", "gather_attention",
    "make_context_parallel_attention", "make_mesh", "make_pipeline",
    "multihost", "partition_specs", "pipeline_apply", "pipeline_gpt",
    "ring_attention", "shard_batch", "shard_params", "stack_gpt_layers",
    "zero1_init", "zero1_shardings", "zero1_spec",
]
