"""Distributed layer: device meshes, sharding rules, collectives.

The reference is single-device with no distributed runtime (SURVEY.md §2.3);
this layer is new TPU-native capability: jax.sharding Meshes with XLA
collectives over ICI, data-parallel training and batch-parallel generation,
and tensor-parallel weight sharding for the CSM backbone/decoder.
"""

from csm_mlx_tpu.parallel.mesh import (
    create_mesh,
    csm_param_spec,
    data_parallel_spec,
    shard_batch,
    shard_model,
    shard_params,
)

__all__ = [
    "create_mesh",
    "csm_param_spec",
    "data_parallel_spec",
    "shard_params",
    "shard_batch",
    "shard_model",
]
