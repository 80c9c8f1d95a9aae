"""Model configurations for the CSM TPU-native framework.

Mirrors the architecture constants of the reference implementation
(`/root/reference/csm_mlx/config.py:3-53`): a Llama-style "1b" backbone
(16 layers, d=2048) and a "100m" RVQ decoder (4 layers, d=1024), both with
Llama-3.1 scaled RoPE (factor 32, theta 500k), plus the HF repo ids for the
Mimi audio codec weights and the Llama-3.2 text tokenizer.

Everything here is a frozen dataclass: configs are static, hashable, and can
be closed over by `jax.jit` without retracing hazards.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RopeScalingConfig:
    """Llama-3.1 rope scaling parameters (reference config.py:14-20)."""

    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    rope_type: str = "llama3"


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Architecture of one Llama transformer stack.

    Field names follow the reference's mlx_lm ModelArgs
    (`/root/reference/csm_mlx/config.py:4-22`).
    """

    model_type: str = "llama"
    vocab_size: int = 128_256
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 8192
    hidden_size: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500_000.0
    rope_scaling: Optional[RopeScalingConfig] = RopeScalingConfig()
    attention_bias: bool = False
    mlp_bias: bool = False
    # The reference reads `max_position_embeddings or 2048`
    # (generation.py:132); mlx_lm leaves it None so 2048 applies.
    max_position_embeddings: int = 2048

    @property
    def n_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def attn_dim(self) -> int:
        return self.num_attention_heads * self.head_dim


BACKBONE_CONFIGURATION = {
    "1b": LlamaConfig(
        vocab_size=128_256,
        num_hidden_layers=16,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=64,
        intermediate_size=8192,
        hidden_size=2048,
        rms_norm_eps=1e-5,
        rope_theta=500_000.0,
        rope_scaling=RopeScalingConfig(),
    )
}

DECODER_CONFIGURATION = {
    "100m": LlamaConfig(
        vocab_size=128_256,
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=2,
        head_dim=128,
        intermediate_size=8192,
        hidden_size=1024,
        rms_norm_eps=1e-5,
        rope_theta=500_000.0,
        rope_scaling=RopeScalingConfig(),
    )
}

# External weight sources (reference config.py:47-53). Downloads are
# host-side conveniences; all loaders also accept local paths.
TOKENIZERS = {
    "audio": {
        "repo_id": "kyutai/moshiko-pytorch-bf16",
        "filename": "tokenizer-e351c8d8-checkpoint125.safetensors",
    },
    "text": {"repo_id": "unsloth/Llama-3.2-1B"},
}
