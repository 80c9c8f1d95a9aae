"""Primitive NN layers as pure functions over parameter pytrees.

Parameters are stored exactly as the reference checkpoint lays them out
(safetensors from `senstella/csm-1b-mlx`): Linear weights are (out, in),
embeddings are (vocab, dim). `linear()` contracts against the last axis of
the stored weight, which XLA lowers to a normal MXU matmul — keeping the
on-disk format as the in-memory format makes weight loading a zero-copy
rename (`/root/reference/csm_mlx/finetune/trainer.py:109` saves the same
layout).

`linear()` dispatches on the param dict itself — a dict carrying
`weight_q`/`scales` runs the quantized path (ops/quant.py), one carrying
`lora_a` adds the adapter contribution (finetune/lora.py semantics, cf.
mlx_lm's LoRALinear used at `/root/reference/csm_mlx/finetune/utils.py:32-51`).
No call-site registration or module patching: any new caller of `linear`
is automatically quant- and LoRA-aware.

Norms accumulate in fp32 and cast back, the standard bf16-safe recipe.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

# Training-time LoRA dropout context: holds (key, call_counter). Set by the
# trainers around loss evaluation (`lora_dropout_rng`); linear() folds a
# distinct per-call-site sub-key at trace time. Outside the context (or at
# inference) dropout is the identity, matching mlx_lm's eval-mode Dropout.
_DROPOUT_CTX: Dict[str, object] = {"key": None, "count": 0}


@contextmanager
def lora_dropout_rng(key: Optional[jax.Array]):
    """Enable LoRA dropout for linear() calls traced inside this scope."""
    prev = dict(_DROPOUT_CTX)
    _DROPOUT_CTX["key"] = key
    _DROPOUT_CTX["count"] = 0
    try:
        yield
    finally:
        _DROPOUT_CTX.update(prev)


def _maybe_dropout(x: jax.Array, rate) -> jax.Array:
    key = _DROPOUT_CTX["key"]
    if key is None:
        return x
    _DROPOUT_CTX["count"] += 1
    sub = jax.random.fold_in(key, _DROPOUT_CTX["count"])
    keep = jnp.asarray(1.0 - rate, jnp.float32)
    mask = jax.random.bernoulli(sub, keep, x.shape)
    scaled = x / keep.astype(x.dtype)
    return jnp.where(mask, scaled, jnp.zeros((), x.dtype)).astype(x.dtype)


def _lora_delta(params: Params, x: jax.Array) -> jax.Array:
    """scale * ((dropout(x) @ A^T) @ B^T) — factored, never materializes BA."""
    scale = params["lora_scale"] if "lora_scale" in params else 1.0
    if "lora_dropout" in params:
        x = _maybe_dropout(x, params["lora_dropout"])
    z = jnp.einsum("...i,ri->...r", x, params["lora_a"].astype(x.dtype))
    z = jnp.einsum("...r,or->...o", z, params["lora_b"].astype(x.dtype))
    return scale * z


def linear(params: Params, x: jax.Array,
           tp: Optional[str] = None) -> jax.Array:
    """y = x @ W^T (+ b). W stored (out, in) like torch/MLX nn.Linear.

    Quantized dicts (weight_q) run the Pallas/XLA quant matmul; LoRA dicts
    (lora_a) add the low-rank adapter term. DoRA requires the dense weight
    (it renormalizes W + BA per row), so it goes through effective_weight.

    `tp` is the caller's tensor-parallel layout hint ("out": output
    channels shard over the mesh's "model" axis, "in": the contracted dim
    does). Dense weights ignore it (GSPMD partitions einsums natively from
    the param shardings); W8A8 dicts use it to route through the shard_map
    kernel path (ops/quant.py::_quant_linear_tp) when an activation-
    sharding mesh is installed.
    """
    if "weight_q" in params:
        if "dora_m" in params:
            raise ValueError(
                "quantized DoRA leaves are unsupported: the per-row "
                "renormalization needs the dense weight (fuse_lora before "
                "quantizing)"
            )
        from csm_mlx_tpu.ops.quant import quant_linear

        y = quant_linear(params, x, tp=tp)
        if "lora_a" in params:
            y = y + _lora_delta(params, x).astype(y.dtype)
        return y
    if "dora_m" in params:
        from csm_mlx_tpu.finetune.lora import effective_weight

        if _DROPOUT_CTX["key"] is not None and "lora_dropout" in params:
            # Training-time DoRA keeps mlx_lm's split: dropout on the
            # adapter branch only, per-row renormalization from the clean
            # (undropped) adapted weight.
            w = params["weight"]
            scale = params.get("lora_scale", 1.0)
            adapted = w.astype(jnp.float32) + scale * (
                params["lora_b"] @ params["lora_a"]).astype(jnp.float32)
            norm = jnp.maximum(
                jnp.linalg.norm(adapted, axis=-1), 1e-6)
            gain = (params["dora_m"].astype(jnp.float32) / norm).astype(
                x.dtype)
            y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype))
            y = (y + _lora_delta(params, x).astype(y.dtype)) * gain
        else:
            w = effective_weight(params)
            y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype))
    elif "lora_a" in params:
        w = params["weight"]
        y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype))
        y = y + _lora_delta(params, x).astype(y.dtype)
    else:
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
    """down(silu(gate(x)) * up(x)) — mlx_lm Llama MLP.

    With fused weights (see models.llama.fuse_layer_weights) gate and up run
    as one wide matmul: decode-time matvecs pay a large fixed cost per call
    on TPU, so fewer/wider calls are strictly faster.
    """
    from csm_mlx_tpu.ops.act_sharding import constrain

    if "gateup_proj" in params:
        gu = linear(params["gateup_proj"], x, tp="out")
        f = gu.shape[-1] // 2
        gate, up = gu[..., :f], gu[..., f:]
    else:
        gate = linear(params["gate_proj"], x, tp="out")
        up = linear(params["up_proj"], x, tp="out")
    # TP: the MLP hidden dim is sharded over "model" (gate/up out-dim rules
    # in parallel.mesh); pinning it keeps the silu*up elementwise ops local.
    hidden = constrain(jax.nn.silu(gate) * up, "data", None, "model")
    return linear(params["down_proj"], hidden, tp="in")
