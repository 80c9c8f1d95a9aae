"""Mimi codec transformer (encoder/decoder transformer at the 25 Hz latent).

8 pre-LN layers with LayerNorm (weight+bias), GPT-NeoX-style half-split RoPE
(theta 10k), layer-scale on both residual branches, gelu MLP without biases,
and causal attention with a 250-frame sliding window — the published
kyutai/mimi architecture the reference gets from moshi_mlx.

Two execution modes:
- batch: full-sequence causal + sliding-window mask (one XLA program);
- streaming: a ring KV cache of `window` slots with absolute positions, so
  `decode_step` (generation.py:249-256 semantics) runs O(window) per frame
  forever without growing state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.models.mimi.config import MimiConfig
from csm_mlx_tpu.ops.attention import NEG_INF, sdpa
from csm_mlx_tpu.ops.layers import linear

Params = Dict[str, Any]


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out.astype(x.dtype) * p["weight"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _rope_half(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Half-split (rotate_half) RoPE, fp32, matching HF Mimi exactly."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.astype(jnp.float32)[..., None] * inv  # (B, S, d/2)
    cos = jnp.cos(ang)[:, :, None, :]  # (B, S, 1, d/2)
    sin = jnp.sin(ang)[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RingKVCache:
    """Sliding-window KV cache: slot = position % window."""

    k: jax.Array  # (L, B, H_kv, W, D)
    v: jax.Array
    index: jax.Array  # () int32 — absolute next position
    # (B,) int32 — first absolute position each row may attend to. Rows
    # all share `index` (one batched stream), but a slot recycled for a new
    # logical stream (continuous batching) must not see its predecessor's
    # window; rotary attention is relative, so masking keys below `start`
    # makes the row exact-equivalent to a fresh stream begun at `start`.
    start: jax.Array

    @staticmethod
    def init(cfg: MimiConfig, batch: int, dtype=jnp.float32,
             slack: int = 8) -> "RingKVCache":
        # Capacity exceeds the attention window so that writing a chunk of S
        # new tokens never evicts a slot an older query in the same chunk
        # still attends to (eviction is masked by absolute position anyway).
        # `slack` bounds the largest streamed chunk (transformer_forward
        # raises past it) — block-decoding callers pass their block size.
        w = cfg.sliding_window + slack
        shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, w,
                 cfg.head_dim)
        return RingKVCache(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            index=jnp.zeros((), jnp.int32),
            start=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def window(self) -> int:
        return self.k.shape[3]


def _attn(
    p: Params,
    cfg: MimiConfig,
    x: jax.Array,
    positions: jax.Array,
    mask_bias: Optional[jax.Array],
    cache: Optional[RingKVCache],
    layer: int,
) -> Tuple[jax.Array, Optional[RingKVCache]]:
    b, s, _ = x.shape
    h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = linear(p["q_proj"], x).reshape(b, s, h, d)
    k = linear(p["k_proj"], x).reshape(b, s, hkv, d)
    v = linear(p["v_proj"], x).reshape(b, s, hkv, d)
    q = _rope_half(q, positions, cfg.rope_theta)
    k = _rope_half(k, positions, cfg.rope_theta)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

    if cache is not None:
        w = cache.window
        # Scatter the s new tokens at slots (index + t) % w.
        slots = (cache.index + jnp.arange(s)) % w
        knew = cache.k.at[layer, :, :, slots, :].set(
            k.transpose(2, 0, 1, 3).astype(cache.k.dtype)
        )
        vnew = cache.v.at[layer, :, :, slots, :].set(
            v.transpose(2, 0, 1, 3).astype(cache.v.dtype)
        )
        cache = dataclasses.replace(cache, k=knew, v=vnew)
        k_full, v_full = knew[layer], vnew[layer]
        # mask_bias: the ring-validity bias, layer-invariant — built ONCE
        # in transformer_forward (see _ring_mask_bias) and shared by all
        # layers, like the batch path's sliding-window mask.
        out = sdpa(q, k_full, v_full, scale=d ** -0.5, mask_bias=mask_bias)
    else:
        out = sdpa(q, k, v, scale=d ** -0.5, mask_bias=mask_bias)

    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return linear(p["o_proj"], out), cache


def transformer_forward(
    params: Params,
    cfg: MimiConfig,
    x: jax.Array,
    positions: Optional[jax.Array] = None,
    cache: Optional[RingKVCache] = None,
) -> Tuple[jax.Array, Optional[RingKVCache]]:
    """x: (B, S, D) latent sequence. Batch mode builds the sliding-window
    causal mask; streaming mode uses the ring cache."""
    b, s, _ = x.shape
    if cache is not None and s > cache.window - cfg.sliding_window:
        # The ring's slack over the attention window bounds the chunk size:
        # a longer chunk would overwrite slots its own earliest queries
        # still attend to, silently truncating their window.
        raise ValueError(
            f"streaming chunk of {s} tokens exceeds the ring slack "
            f"({cache.window - cfg.sliding_window}); feed shorter chunks or "
            f"use the batch path"
        )
    if positions is None:
        if cache is not None:
            positions = cache.index + jnp.arange(s, dtype=jnp.int32)[None]
        else:
            positions = jnp.arange(s, dtype=jnp.int32)[None]
        positions = jnp.broadcast_to(positions, (b, s))

    if cache is None:
        q_pos = jnp.arange(s)[:, None]
        k_pos = jnp.arange(s)[None, :]
        ok = (k_pos <= q_pos) & (k_pos > q_pos - cfg.sliding_window)
        mask_bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[None, None]
    else:
        # Ring-slot key validity: slot holds absolute position p_slot; a
        # query at q_pos sees it iff q_pos - window < p_slot <= q_pos and
        # p_slot >= start (per-row stream start hides a recycled row's
        # predecessor). Slot j holds position j + w*floor((last - j)/w),
        # last = index + s - 1 the newest absolute position. Depends only
        # on (index, start, positions) — layer-invariant, built once here.
        w = cache.window
        last = cache.index + s - 1
        j = jnp.arange(w)
        p_slot = j + w * ((last - j) // w)
        valid = (p_slot[None, None, :] <= positions[:, :, None]) & (
            p_slot[None, None, :] > positions[:, :, None] - cfg.sliding_window
        ) & (p_slot[None, None, :] >= cache.start[:, None, None])
        mask_bias = jnp.where(valid, 0.0, NEG_INF).astype(
            jnp.float32)[:, None]

    for i, lp in enumerate(params["layers"]):
        h = layer_norm(lp["input_layernorm"], x, cfg.norm_eps)
        attn_out, cache = _attn(lp["self_attn"], cfg, h, positions, mask_bias,
                                cache, i)
        x = x + attn_out * lp["self_attn_layer_scale"]["scale"].astype(x.dtype)
        h = layer_norm(lp["post_attention_layernorm"], x, cfg.norm_eps)
        mlp = linear(lp["mlp"]["fc2"], jax.nn.gelu(linear(lp["mlp"]["fc1"], h),
                                                   approximate=False))
        x = x + mlp * lp["mlp_layer_scale"]["scale"].astype(x.dtype)

    if cache is not None:
        cache = dataclasses.replace(cache, index=cache.index + s)
    return x, cache


def init_transformer_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)

        def dense(k, o, ii):
            return {"weight": (jax.random.normal(k, (o, ii)) * ii ** -0.5).astype(dtype)}

        layers.append({
            "self_attn": {
                "q_proj": dense(ks[0], cfg.num_attention_heads * cfg.head_dim, d),
                "k_proj": dense(ks[1], cfg.num_key_value_heads * cfg.head_dim, d),
                "v_proj": dense(ks[2], cfg.num_key_value_heads * cfg.head_dim, d),
                "o_proj": dense(ks[3], d, cfg.num_attention_heads * cfg.head_dim),
            },
            "mlp": {
                "fc1": dense(ks[4], cfg.intermediate_size, d),
                "fc2": dense(ks[5], d, cfg.intermediate_size),
            },
            "input_layernorm": {"weight": jnp.ones((d,), dtype),
                                "bias": jnp.zeros((d,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((d,), dtype),
                                         "bias": jnp.zeros((d,), dtype)},
            "self_attn_layer_scale": {
                "scale": jnp.full((d,), cfg.layer_scale_initial_scale, dtype)},
            "mlp_layer_scale": {
                "scale": jnp.full((d,), cfg.layer_scale_initial_scale, dtype)},
        })
    return {"layers": layers}
