"""Distributed layer: device meshes, sharding rules, collectives.

The reference is single-device with no distributed runtime (SURVEY.md §2.3);
this layer is new TPU-native capability: jax.sharding Meshes with XLA
collectives over ICI, data-parallel training and batch-parallel generation,
tensor-parallel weight sharding for the CSM backbone/decoder, FSDP (ZeRO-3
storage sharding) for training, GPipe-style pipeline parallelism for the
backbone stack (parallel.pipeline), and ring-attention sequence
parallelism (parallel.sequence).
"""

from csm_mlx_tpu.parallel.pipeline import (
    pipeline_forward,
    shard_pipeline_params,
    stack_pipeline_params,
)
from csm_mlx_tpu.parallel.sequence import ring_sdpa, shard_sequence
from csm_mlx_tpu.parallel.mesh import (
    create_mesh,
    csm_param_spec,
    data_parallel_spec,
    fsdp_param_spec,
    shard_batch,
    shard_model,
    shard_params,
    shard_params_fsdp,
)

__all__ = [
    "create_mesh",
    "csm_param_spec",
    "data_parallel_spec",
    "fsdp_param_spec",
    "shard_params",
    "shard_params_fsdp",
    "shard_batch",
    "shard_model",
    "pipeline_forward",
    "shard_pipeline_params",
    "stack_pipeline_params",
    "ring_sdpa",
    "shard_sequence",
]
