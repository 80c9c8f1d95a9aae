"""Primitive NN layers as pure functions over parameter pytrees.

Parameters are stored exactly as the reference checkpoint lays them out
(safetensors from `senstella/csm-1b-mlx`): Linear weights are (out, in),
embeddings are (vocab, dim). `linear()` contracts against the last axis of
the stored weight, which XLA lowers to a normal MXU matmul — keeping the
on-disk format as the in-memory format makes weight loading a zero-copy
rename (`/root/reference/csm_mlx/finetune/trainer.py:109` saves the same
layout).

Norms accumulate in fp32 and cast back, the standard bf16-safe recipe.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def linear(params: Params, x: jax.Array) -> jax.Array:
    """y = x @ W^T (+ b). W stored (out, in) like torch/MLX nn.Linear."""
    w = params["weight"]
    y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def emb_table(params: Params) -> jax.Array:
    """Effective embedding table, honoring LoRA adapters if present
    (finetune/lora.py adds lora_a/lora_b to embedding param dicts)."""
    w = params["weight"]
    if "lora_a" in params:
        scale = params["lora_scale"] if "lora_scale" in params else 1.0
        w = w + (scale * (params["lora_b"] @ params["lora_a"])).astype(w.dtype)
    return w


def embedding(params: Params, ids: jax.Array) -> jax.Array:
    """Row gather from an embedding table stored (vocab, dim)."""
    return emb_table(params)[ids]


def rms_norm(params: Params, x: jax.Array, eps: float) -> jax.Array:
    """RMSNorm matching mlx_lm's Llama (weight * x / rms, fp32 accumulation)."""
    xf = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rrms).astype(x.dtype) * params["weight"].astype(x.dtype)


def swiglu_mlp(params: Dict[str, Params], x: jax.Array) -> jax.Array:
    """down(silu(gate(x)) * up(x)) — mlx_lm Llama MLP."""
    gate = linear(params["gate_proj"], x)
    up = linear(params["up_proj"], x)
    return linear(params["down_proj"], jax.nn.silu(gate) * up)
