"""Mimi neural audio codec (TPU-native JAX implementation)."""

from csm_mlx_tpu.models.mimi.config import MimiConfig, mimi_202407
from csm_mlx_tpu.models.mimi.mimi import (
    Mimi,
    MimiDecodeState,
    MimiEncodeState,
    init_mimi_params,
    mimi_decode_fn,
    mimi_decode_step_fn,
    mimi_encode_fn,
    mimi_encode_step_fn,
)

__all__ = [
    "Mimi",
    "MimiConfig",
    "mimi_202407",
    "MimiDecodeState",
    "MimiEncodeState",
    "init_mimi_params",
    "mimi_encode_fn",
    "mimi_decode_fn",
    "mimi_decode_step_fn",
    "mimi_encode_step_fn",
]
