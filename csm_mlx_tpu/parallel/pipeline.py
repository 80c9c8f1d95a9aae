"""GPipe-style pipeline parallelism for the backbone layer stack.

The reference has no distributed layer at all (SURVEY.md §2.3); like the
TP/FSDP rules in `parallel.mesh`, this is new TPU-native capability: the
16-layer CSM backbone is split into contiguous stages laid out over a
"pipe" mesh axis, and a microbatched forward streams activations
stage-to-stage over ICI with `jax.lax.ppermute` inside `shard_map`.

Design (scaling-book pipelining recipe, expressed the JAX way):

- Stage weights are the *storage* layout: every per-layer leaf is stacked
  to (n_stages, layers_per_stage, ...) and sharded `P("pipe")` on dim 0,
  so each device holds only its own stage's layers.
- The schedule is a `lax.scan` over `n_micro + n_stages - 1` ticks. Each
  tick, every device runs its stage on its current microbatch activation
  and `ppermute`s the result to the next stage; stage 0 injects fresh
  microbatches, the last stage collects outputs. The scan keeps the whole
  schedule inside ONE compiled program — no per-tick dispatch.
- Gradients flow through `ppermute`/`scan` (their transposes are the
  reverse permute / reverse scan), so the same forward serves training;
  wrap stages in `jax.checkpoint` with `remat=True`.

The bubble fraction is (n_stages-1)/(n_micro+n_stages-1): pick
n_micro >= ~4x n_stages for training efficiency.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_mlx_tpu.config import LlamaConfig
from csm_mlx_tpu.ops.attention import sdpa
from csm_mlx_tpu.ops.layers import linear, rms_norm, swiglu_mlp
from csm_mlx_tpu.ops.rope import apply_rope

from csm_mlx_tpu.parallel._compat import shard_map


def stack_pipeline_params(layers: Sequence[Any], n_stages: int) -> Any:
    """Stack a per-layer param list into per-stage storage.

    Every leaf becomes (n_stages, layers_per_stage, *leaf.shape); shard
    dim 0 over "pipe" (see `shard_pipeline_params`). Requires
    len(layers) % n_stages == 0 (contiguous equal stages).
    """
    n_layers = len(layers)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} layers do not split into {n_stages} equal stages")
    per = n_layers // n_stages

    def stk(*leaves):
        a = jnp.stack(leaves)
        return a.reshape((n_stages, per) + a.shape[1:])

    return jax.tree.map(stk, *layers)


def shard_pipeline_params(stacked: Any, mesh: Mesh) -> Any:
    """device_put stage-stacked params with stage dim over "pipe"."""
    def put(a):
        spec = P(*(("pipe",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked)


def _stage_apply(stage_params: Any, cfg: LlamaConfig, x: jax.Array,
                 cos: jax.Array, sin: jax.Array, positions: jax.Array,
                 mask_bias: jax.Array) -> jax.Array:
    """Run one stage's layers_per_stage transformer layers (training path:
    full-sequence attention, no KV cache). Mirrors llama.one_layer."""
    per = jax.tree.leaves(stage_params)[0].shape[0]
    b, s, _ = x.shape
    eps = cfg.rms_norm_eps
    for i in range(per):  # static unroll: per-stage layer count is small
        lp = jax.tree.map(lambda a: a[i], stage_params)
        attn, h = lp["self_attn"], rms_norm(lp["input_layernorm"], x, eps)
        if "qkv_proj" in attn:  # fused layout (models.llama.fuse_layer_weights)
            attn_dim = cfg.num_attention_heads * cfg.head_dim
            kv_dim = cfg.num_key_value_heads * cfg.head_dim
            qkv = linear(attn["qkv_proj"], h)
            q = qkv[..., :attn_dim].reshape(
                b, s, cfg.num_attention_heads, cfg.head_dim)
            k = qkv[..., attn_dim:attn_dim + kv_dim].reshape(
                b, s, cfg.num_key_value_heads, cfg.head_dim)
            v = qkv[..., attn_dim + kv_dim:].reshape(
                b, s, cfg.num_key_value_heads, cfg.head_dim)
        else:
            q = linear(attn["q_proj"], h).reshape(
                b, s, cfg.num_attention_heads, cfg.head_dim)
            k = linear(attn["k_proj"], h).reshape(
                b, s, cfg.num_key_value_heads, cfg.head_dim)
            v = linear(attn["v_proj"], h).reshape(
                b, s, cfg.num_key_value_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin, positions).transpose(0, 2, 1, 3)
        k = apply_rope(k, cos, sin, positions).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = sdpa(q, k, v, scale=cfg.head_dim ** -0.5, mask_bias=mask_bias)
        x = x + linear(attn["o_proj"],
                       out.transpose(0, 2, 1, 3).reshape(b, s, -1))
        x = x + swiglu_mlp(lp["mlp"], rms_norm(
            lp["post_attention_layernorm"], x, eps))
    return x


def pipeline_forward(
    stacked: Any,
    cfg: LlamaConfig,
    embeds: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    mask_bias: jax.Array,
    mesh: Mesh,
    n_micro: int,
    norm: Optional[Any] = None,
    remat: bool = False,
    data_axis: Optional[str] = None,
) -> jax.Array:
    """Pipeline the layer stack over mesh axis "pipe".

    Args:
      stacked: `stack_pipeline_params` output, sharded over "pipe".
      embeds: (B, S, D) — B must divide into n_micro microbatches.
      cos/sin/positions/mask_bias: as llama_forward (replicated).
      norm: optional final-norm params applied after the pipeline.
      data_axis: optional second mesh axis for 2-D PP x DP: each
        microbatch's rows are additionally sharded over it, so every
        (pipe, data) device runs its stage on 1/n_data of the microbatch.

    Returns hidden (B, S, D); replicated over "pipe", sharded over
    `data_axis` (if given) on dim 0.
    """
    n_stages = mesh.shape["pipe"]
    b = embeds.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible into {n_micro} microbatches")
    mb = b // n_micro
    if data_axis is not None and mb % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"microbatch {mb} not divisible over {data_axis}="
            f"{mesh.shape[data_axis]}")
    micro = embeds.reshape((n_micro, mb) + embeds.shape[1:])

    # Batch-dependent positions/mask (the normal left-padded fine-tuning
    # case) must travel WITH their microbatch through the pipe — stage s at
    # tick t is processing microbatch t-s, not a shared one. Batch-free
    # (1, ...) inputs stay replicated, the cheap path.
    pos_split = positions.shape[0] == b and b > 1
    mask_split = mask_bias.shape[0] == b and b > 1
    if pos_split:
        positions = positions.reshape((n_micro, mb) + positions.shape[1:])
    if mask_split:
        mask_bias = mask_bias.reshape((n_micro, mb) + mask_bias.shape[1:])

    fwd = _build_pipeline_fwd(cfg, mesh, n_micro, n_stages, remat,
                              data_axis, pos_split, mask_split,
                              _treedef(stacked))
    out = fwd(stacked, micro, cos, sin, positions, mask_bias)
    out = out.reshape(embeds.shape)
    if norm is not None:
        out = rms_norm(norm, out, cfg.rms_norm_eps)
    return out


def _treedef(tree: Any):
    return jax.tree.structure(tree)


@lru_cache(maxsize=32)
def _build_pipeline_fwd(cfg, mesh, n_micro, n_stages, remat, data_axis,
                        pos_split, mask_split, stacked_def):
    """Cache the shard_map-wrapped schedule per static configuration —
    rebuilding the closure every call would defeat jax's dispatch cache
    and re-trace on each eager invocation."""
    stage = partial(_stage_apply, cfg=cfg)
    if remat:
        stage = jax.checkpoint(stage)

    def per_device(stacked_local, micro_all, cos, sin, positions, mask_bias):
        lp = jax.tree.map(lambda a: a[0], stacked_local)  # (1, per, …) → (per, …)
        idx = jax.lax.axis_index("pipe")
        ticks = n_micro + n_stages - 1
        out_buf = jnp.zeros_like(micro_all)
        x0 = jnp.zeros(micro_all.shape[1:], micro_all.dtype)
        pos0 = (jnp.zeros(positions.shape[1:], positions.dtype)
                if pos_split else None)
        mask0 = (jnp.zeros(mask_bias.shape[1:], mask_bias.dtype)
                 if mask_split else None)

        def tick(carry, t):
            (x, pos_c, mask_c), out_buf = carry
            feed_idx = jnp.minimum(t, n_micro - 1)
            x_in = jnp.where(idx == 0, micro_all[feed_idx], x)
            pos_in = (jnp.where(idx == 0, positions[feed_idx], pos_c)
                      if pos_split else positions)
            mask_in = (jnp.where(idx == 0, mask_bias[feed_idx], mask_c)
                       if mask_split else mask_bias)
            y = stage(lp, x=x_in, cos=cos, sin=sin, positions=pos_in,
                      mask_bias=mask_in)
            slot = jnp.maximum(t - (n_stages - 1), 0)
            collected = out_buf.at[slot].set(y)
            take = (idx == n_stages - 1) & (t >= n_stages - 1)
            out_buf = jnp.where(take, collected, out_buf)
            perm = [(i, i + 1) for i in range(n_stages - 1)]
            x_next = jax.lax.ppermute(y, "pipe", perm)
            pos_next = (jax.lax.ppermute(pos_in, "pipe", perm)
                        if pos_split else None)
            mask_next = (jax.lax.ppermute(mask_in, "pipe", perm)
                         if mask_split else None)
            return ((x_next, pos_next, mask_next), out_buf), None

        ((_, _, _), out_buf), _ = jax.lax.scan(
            tick, ((x0, pos0, mask0), out_buf), jnp.arange(ticks))
        # Only the last stage's buffer is real; psum broadcasts it.
        return jax.lax.psum(
            jnp.where(idx == n_stages - 1, out_buf, 0.0), "pipe")

    micro_spec = P(None, data_axis) if data_axis else P()
    stacked_specs = jax.tree.unflatten(
        stacked_def, [P("pipe")] * stacked_def.num_leaves)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(stacked_specs, micro_spec,
                  P(), P(),
                  micro_spec if pos_split else P(),
                  micro_spec if mask_split else P()),
        out_specs=micro_spec,
        check_rep=False,
    )
