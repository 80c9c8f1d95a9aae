"""Functional Llama transformer stack (embedding-less, CSM-style).

The reference builds `mlx_lm.models.llama.LlamaModel` and patches
`embed_tokens` to Identity and every layer's attention to a torchtune-parity
module (`/root/reference/csm_mlx/models.py:50-77`). Here the stack is a pure
function over a parameter pytree whose keys mirror the reference checkpoint:

  layers.{i}.self_attn.{q,k,v,o}_proj.weight
  layers.{i}.mlp.{gate,up,down}_proj.weight
  layers.{i}.{input,post_attention}_layernorm.weight
  norm.weight

represented as nested dicts: params["layers"][i]["self_attn"]["q_proj"]...

Forward always consumes *embeddings* (B, S, D) — CSM computes the fused
text+audio embedding externally (`models.py:82-92`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.config import LlamaConfig
from csm_mlx_tpu.ops.act_sharding import constrain
from csm_mlx_tpu.ops.attention import sdpa
from csm_mlx_tpu.ops.kv_cache import KVCache
from csm_mlx_tpu.ops.layers import linear, rms_norm, swiglu_mlp
from csm_mlx_tpu.ops.rope import apply_rope

Params = Dict[str, Any]


def init_llama_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random init (normal / sqrt(fan_in)); layout identical to checkpoints."""
    d = cfg.hidden_size
    attn_dim = cfg.attn_dim
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    f = cfg.intermediate_size

    def dense(key, out_dim, in_dim):
        return {
            "weight": (
                jax.random.normal(key, (out_dim, in_dim), dtype=jnp.float32)
                * (in_dim ** -0.5)
            ).astype(dtype)
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        keys = jax.random.split(jax.random.fold_in(key, i), 7)
        layers.append(
            {
                "self_attn": {
                    "q_proj": dense(keys[0], attn_dim, d),
                    "k_proj": dense(keys[1], kv_dim, d),
                    "v_proj": dense(keys[2], kv_dim, d),
                    "o_proj": dense(keys[3], d, attn_dim),
                },
                "mlp": {
                    "gate_proj": dense(keys[4], f, d),
                    "up_proj": dense(keys[5], f, d),
                    "down_proj": dense(keys[6], d, f),
                },
                "input_layernorm": {"weight": jnp.ones((d,), dtype=dtype)},
                "post_attention_layernorm": {"weight": jnp.ones((d,), dtype=dtype)},
            }
        )
    return {"layers": layers, "norm": {"weight": jnp.ones((d,), dtype=dtype)}}


def fuse_layer_weights(params: Params) -> None:
    """Concatenate q/k/v -> qkv_proj and gate/up -> gateup_proj in place.

    Decode-time matvecs on TPU pay a ~7 us fixed cost per call regardless of
    size (benchmarks/micro_dma.py findings), so a 16-layer backbone step
    spends more on call overhead than on FLOPs; fusing QKV (3 calls -> 1) and
    gate+up (2 -> 1) makes each call wider instead. Works on raw
    ({"weight"}) and quantized ({"weight_q","scales","biases"}) dicts —
    everything concatenates along the output axis. Dicts carrying LoRA
    adapters are left unfused (adapters address the unfused layout).

    In-memory transform only: fused params are not meant to be saved back to
    the reference checkpoint layout.
    """

    def fuse(dicts):
        keys = set(dicts[0].keys())
        if any(set(d.keys()) != keys for d in dicts):
            return None
        if not keys <= {"weight", "weight_q", "scales", "biases"}:
            return None  # LoRA/bias/unknown layout: keep unfused
        return {k: jnp.concatenate([d[k] for d in dicts], axis=0)
                for k in keys}

    for layer in params.get("layers", []):
        attn = layer["self_attn"]
        if "q_proj" in attn and "qkv_proj" not in attn:
            fused = fuse([attn["q_proj"], attn["k_proj"], attn["v_proj"]])
            if fused is not None:
                attn["qkv_proj"] = fused
                for k in ("q_proj", "k_proj", "v_proj"):
                    del attn[k]
        mlp = layer["mlp"]
        if "gate_proj" in mlp and "gateup_proj" not in mlp:
            fused = fuse([mlp["gate_proj"], mlp["up_proj"]])
            if fused is not None:
                mlp["gateup_proj"] = fused
                for k in ("gate_proj", "up_proj"):
                    del mlp[k]


def _attn_layer(
    p: Params,
    cfg: LlamaConfig,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    mask_bias: Optional[jax.Array],
    cache: Optional[KVCache],
    layer_idx: int,
    **kwargs,
) -> Tuple[jax.Array, Optional[KVCache]]:
    b, s, _ = x.shape
    flash_pad_len = kwargs.get("flash_pad_len")
    if "qkv_proj" in p:
        # Fused QKV (see fuse_layer_weights): one wide matmul amortizes the
        # per-call fixed cost that dominates M=1 decode matvecs on TPU.
        attn_dim = cfg.attn_dim
        kv_dim = cfg.num_key_value_heads * cfg.head_dim
        qkv = linear(p["qkv_proj"], x, tp="out")
        q = qkv[..., :attn_dim].reshape(b, s, cfg.num_attention_heads,
                                        cfg.head_dim)
        k = qkv[..., attn_dim:attn_dim + kv_dim].reshape(
            b, s, cfg.num_key_value_heads, cfg.head_dim)
        v = qkv[..., attn_dim + kv_dim:].reshape(
            b, s, cfg.num_key_value_heads, cfg.head_dim)
    else:
        q = linear(p["q_proj"], x, tp="out").reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
        k = linear(p["k_proj"], x, tp="out").reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
        v = linear(p["v_proj"], x, tp="out").reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)

    # TP: heads shard over "model", batch over "data" (no-op without a mesh).
    q = constrain(q, "data", None, "model", None)
    k = constrain(k, "data", None, "model", None)
    v = constrain(v, "data", None, "model", None)

    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)

    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if cache is not None:
        cache, k, v = cache.update_layer(layer_idx, k, v)

    if isinstance(k, tuple):
        # TieredKVCache block decode: invariant big tier + carried recent
        # tier, one softmax across both (ops/attention.py::tiered_sdpa;
        # the scan-carry read-rate collapse it avoids is measured in
        # benchmarks/micro_kv_carry.py).
        from csm_mlx_tpu.ops.attention import tiered_sdpa

        out = tiered_sdpa(q, k, v, cfg.head_dim ** -0.5, mask_bias,
                          cache.index - cache.base)
    elif flash_pad_len is not None:
        # Pallas flash prefill: causal + left-pad masking in-kernel over the
        # first S cache slots (everything past the prompt is causally
        # unreachable anyway); logits stay in VMEM.
        from csm_mlx_tpu.ops.attention import flash_prefill_sdpa

        out = flash_prefill_sdpa(q, k[:, :, :s], v[:, :, :s],
                                 scale=cfg.head_dim ** -0.5,
                                 pad_len=flash_pad_len)
    elif kwargs.get("flash_train"):
        # Differentiable flash attention (training): custom-VJP Pallas
        # kernels, no (B,H,S,S) logits in HBM forward OR backward. Only
        # valid for a fresh causal sequence (no cache; the caller's mask is
        # pure causal — asserted at the llama_forward boundary).
        from csm_mlx_tpu.ops.flash_train import flash_attention

        out = flash_attention(q, k, v, scale=cfg.head_dim ** -0.5)
    elif (kwargs.get("decode_pad_len") is not None and s == 1
          and cache is not None and b >= int(os.environ.get(
              "CSM_TPU_FLASH_DECODE_MIN_B", "8"))
          and os.environ.get("CSM_TPU_FLASH_DECODE", "0") != "0"
          and (jax.default_backend() == "tpu" or os.environ.get(
              "CSM_TPU_FLASH_DECODE") == "interpret")):
        # OPT-IN (default off): the per-row Pallas decode kernel keeps the
        # (group, cap) logits/probs in VMEM, but measured 1.47x SLOWER
        # than the einsum path at B=48 x cap 768 (9.50 vs 6.46 ms/step,
        # benchmarks/flash_decode_ab.py) — its per-row K/V DMA streams
        # below XLA's batched-read rate. Kept behind CSM_TPU_FLASH_DECODE=1
        # for future-hardware re-evaluation.
        from csm_mlx_tpu.ops.attention import flash_decode_sdpa

        out = flash_decode_sdpa(q, k, v, cfg.head_dim ** -0.5,
                                kwargs["decode_pad_len"], cache.index)
    else:
        # NOTE on large caches: reading only a prefix of k/v here — whether
        # via lax.switch over buckets or a static slice — measured SLOWER
        # than the full read (XLA materializes per-layer copies of the
        # sliced K/V inside the decode scan; benchmarks/kv_buckets_ab.py).
        # The shipping fix sizes the cache BUFFER itself to a bucket
        # (ops/attention.py::kv_prefix_buckets) — this einsum is already
        # shape-polymorphic over capacity.
        out = sdpa(q, k, v, scale=cfg.head_dim ** -0.5, mask_bias=mask_bias)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
    # o_proj contracts the head-sharded dim -> XLA inserts the all-reduce;
    # pin its input so the partitioner doesn't replicate the attention out.
    out = constrain(out, "data", None, "model")
    return constrain(linear(p["o_proj"], out, tp="in"), "data", None, None), cache


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    embeds: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    mask_bias: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    remat: bool = False,
    flash_pad_len: Optional[jax.Array] = None,
    flash_train: bool = False,
    decode_pad_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the stack.

    Args:
      embeds: (B, S, D) input embeddings.
      positions: (B, S) or (S,) RoPE positions for the new tokens.
      mask_bias: additive fp32 attention bias, broadcastable to
        (B, 1, S, S_k) where S_k is S (no cache) or cache capacity.
      cache: optional static KVCache; when given, K/V are appended at
        cache.index and attention runs over the whole capacity (caller masks
        invalid slots). The advanced cache is returned.
      remat: wrap each layer in jax.checkpoint (training memory saver).
      flash_pad_len: (B,) left-pad lengths — when given, attention runs the
        Pallas flash-prefill kernel (causal + left-pad masking in-kernel)
        instead of the masked einsum path; requires a fresh cache (prefill).
      flash_train: run the differentiable flash-attention kernels
        (ops/flash_train.py) — training-only: requires no cache and a pure
        causal mask (the caller passes mask_bias=None to make that explicit).
      decode_pad_len: (B,) left pads of a SINGLE-position decode step —
        enables the Pallas flash-decode kernel at batch >= MIN_B
        (ops/attention.py::flash_decode_sdpa); the caller still passes the
        equivalent mask_bias for the einsum fallback.

    Returns (hidden (B, S, D), cache').
    """
    if flash_train and (cache is not None or mask_bias is not None):
        raise ValueError(
            "flash_train requires a fresh causal sequence: no cache, and "
            "mask_bias must be None (the kernel applies causal masking "
            "itself; any other mask would be silently ignored)")

    def one_layer(x, cache, lp, idx):
        attn_out, cache = _attn_layer(
            lp["self_attn"], cfg, rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps),
            cos, sin, positions, mask_bias, cache, idx,
            flash_pad_len=flash_pad_len, flash_train=flash_train,
            decode_pad_len=decode_pad_len,
        )
        x = constrain(x + attn_out, "data", None, None)
        h = rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        x = constrain(x + swiglu_mlp(lp["mlp"], h), "data", None, None)
        return x, cache

    if remat:
        one_layer = jax.checkpoint(one_layer, static_argnums=(3,))

    x = embeds
    for idx, lp in enumerate(params["layers"]):
        x, cache = one_layer(x, cache, lp, idx)

    if cache is not None:
        cache = cache.advance(embeds.shape[1])
    return rms_norm(params["norm"], x, cfg.rms_norm_eps), cache
