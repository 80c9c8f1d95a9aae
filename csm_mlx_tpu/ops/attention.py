"""Grouped-query attention for TPU.

Replaces the reference's fused Metal SDPA + `mx.repeat` GQA expansion
(`/root/reference/csm_mlx/attention.py:242-249`). Instead of materializing
repeated K/V heads, queries are reshaped to (B, n_kv, group, S, D) and the
contraction is expressed with einsum so XLA maps it straight onto the MXU
without the copy.

Softmax runs in fp32 regardless of the compute dtype (bf16-safe), masked
positions get a large negative bias. All mask builders produce additive fp32
biases so they fuse into the logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask_bias(q_len: int, k_len: int, q_offset: int | jax.Array = 0) -> jax.Array:
    """(q_len, k_len) additive fp32 bias; query i attends keys <= i+offset."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + q_offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return jnp.where(k_pos <= q_pos, 0.0, NEG_INF).astype(jnp.float32)


def key_validity_bias(valid: jax.Array) -> jax.Array:
    """(..., k_len) boolean key validity -> additive bias (..., 1, k_len)."""
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[..., None, :]


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask_bias: jax.Array | None = None,
) -> jax.Array:
    """Scaled dot-product attention with implicit GQA.

    Args:
      q: (B, n_heads, S_q, D)
      k, v: (B, n_kv_heads, S_k, D); n_heads % n_kv_heads == 0.
      scale: softmax scale (reference uses head_dim ** -0.5).
      mask_bias: additive fp32 bias broadcastable to (B, 1|n_heads, S_q, S_k).

    Returns (B, n_heads, S_q, D) in q.dtype.
    """
    b, n_heads, s_q, d = q.shape
    n_kv = k.shape[1]
    group = n_heads // n_kv

    qg = q.reshape(b, n_kv, group, s_q, d)
    # logits in fp32 for numerically-stable softmax.
    logits = jnp.einsum(
        "bkgqd,bkld->bkgql", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if mask_bias is not None:
        if mask_bias.ndim == 2:  # (S_q, S_k)
            bias = mask_bias[None, None, None]
        elif mask_bias.ndim == 3:  # (B, S_q, S_k)
            bias = mask_bias[:, None, None]
        elif mask_bias.ndim == 4:  # (B|1, H|1, S_q, S_k), H in {1, n_heads}
            h = mask_bias.shape[1]
            if h == n_heads:
                bm = mask_bias.shape[0]
                bias = mask_bias.reshape(bm, n_kv, group, s_q, -1)
            else:
                bias = mask_bias[:, :, None]  # broadcast over (n_kv, group)
        else:
            bias = mask_bias
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgql,bkld->bkgqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, n_heads, s_q, d).astype(q.dtype)
