"""Causal streaming 1-D convolutions for the Mimi/SEANet codec.

The reference consumes these from `moshi_mlx` (Metal kernels behind
`csm_mlx/tokenizers.py:14-21`); here they are JAX convs with explicit
streaming state so `decode_step` (`/root/reference/csm_mlx/generation.py:249-256`)
can emit one 80 ms chunk per frame with bit-identical results to the batch
path.

Conventions
- Arrays are channel-first: (B, C, T), matching the codec weight layout
  (out, in, kernel) from the moshi/torch checkpoints.
- A *causal* conv pads `(kernel-1)*dilation - (stride-1)` zeros on the left
  at t=0; in streaming mode that left context is carried between calls.
- A causal transposed conv produces `T*stride` samples per `T` inputs; the
  trailing `kernel - stride` outputs overlap the next chunk and are carried
  as a partial sum (trim_right_ratio=1.0 semantics).

XLA lowers `lax.conv_general_dilated` to the TPU conv/MXU path; the
streaming step sizes (T=1 or 2 frames) are static so everything jits once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def _quant_act(x: jax.Array):
    """Per-batch-row dynamic int8 activation quant for W8A8 convs: one scale
    over the whole (C, T) chunk — the conv reduction window spans channels
    AND taps, so every element it sums must share a scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2), keepdims=True), 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127).astype(jnp.int8)
    return xq, amax * (1.0 / 127.0)


def conv1d(
    params: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Plain (non-causal, 'valid') conv. x: (B, C_in, T); w: (C_out, C_in/g, K).

    A quantized param dict ({"weight_q" (C_out, C_in, K) int8, "scales"
    (C_out,)}, from models.mimi.quant) runs int8 x int8 -> int32 on the MXU
    with symmetric per-out-channel dequant (w ~ s_o q, so
    out = s_o * (absmax/127) * int_out + bias)."""
    if "weight_q" in params:
        if groups != 1:
            raise ValueError("quantized conv1d supports groups=1 only")
        xq, inv_xs = _quant_act(x)
        out = jax.lax.conv_general_dilated(
            xq,
            params["weight_q"],
            window_strides=(stride,),
            padding="VALID",
            rhs_dilation=(dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32,
        )
        out = (out.astype(jnp.float32)
               * params["scales"].astype(jnp.float32)[None, :, None] * inv_xs)
        if "bias" in params:
            out = out + params["bias"].astype(jnp.float32)[None, :, None]
        return out.astype(x.dtype)
    w = params["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in params:
        out = out + params["bias"].astype(out.dtype)[None, :, None]
    return out


def causal_pad_amount(kernel: int, stride: int, dilation: int) -> int:
    """Left padding so output length == ceil(T/stride) with no lookahead."""
    return (kernel - 1) * dilation - (stride - 1)


def causal_conv1d(
    params: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    pad = causal_pad_amount(
        params.get("weight_q", params.get("weight")).shape[-1], stride,
        dilation)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
    return conv1d(params, x, stride=stride, dilation=dilation, groups=groups)


def conv_transpose1d(
    params: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Full transposed conv; x: (B, C_in, T) -> (B, C_out, (T-1)*stride + K).

    Weight layout (C_in, C_out/groups, K) (torch ConvTranspose1d). Quantized
    dicts (weight_q int8 in the same layout + per-C_out symmetric scales)
    run the identical flip/reshape on the codes and the conv in
    int8 x int8 -> int32 (see conv1d).
    """
    quant = "weight_q" in params
    w = params["weight_q"] if quant else params["weight"]
    c_in, c_out_g, k = w.shape
    # Expressed as dilated scatter + forward conv with flipped kernel — the
    # textbook transposed-conv identity; handles groups uniformly (Mimi's
    # upsample uses groups == channels). XLA lowers lhs_dilation natively,
    # so use lhs_dilation instead of a materialized scatter.
    # Forward-conv weight from torch convtr layout (C_in, C_out/g, K):
    wf = jnp.flip(w, axis=-1)
    c_out = c_out_g * groups
    wf = wf.reshape(groups, c_in // groups, c_out_g, k)
    wf = wf.transpose(0, 2, 1, 3).reshape(c_out, c_in // groups, k)
    if quant:
        if groups != 1:
            raise ValueError("quantized conv-transpose supports groups=1 "
                             "only")
        xq, inv_xs = _quant_act(x)
        out = jax.lax.conv_general_dilated(
            xq,
            wf,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32,
        )
        out = (out.astype(jnp.float32)
               * params["scales"].astype(jnp.float32)[None, :, None] * inv_xs)
        if "bias" in params:
            out = out + params["bias"].astype(jnp.float32)[None, :, None]
        return out.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        wf.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in params:
        out = out + params["bias"].astype(out.dtype)[None, :, None]
    return out


def causal_conv_transpose1d(
    params: Params,
    x: jax.Array,
    *,
    stride: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Causal transposed conv: emit exactly T*stride samples (trim right)."""
    full = conv_transpose1d(params, x, stride=stride, groups=groups)
    t_out = x.shape[-1] * stride
    return full[:, :, :t_out]


# ---------------------------------------------------------------------------
# Streaming wrappers
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConvState:
    """Carried left context for a causal conv: (B, C_in, pad)."""

    prev: jax.Array


def causal_conv1d_streaming(
    params: Params,
    x: jax.Array,
    state: ConvState,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> Tuple[jax.Array, ConvState]:
    """Streamed causal conv over a chunk whose length is a multiple of stride.

    state.prev holds the last `pad` input samples (zeros at t=0); output is
    identical to slicing the batch causal conv at the same offsets.
    """
    if stride > 1 and x.shape[-1] % stride != 0:
        # A partial stride window would leave consumed-vs-carried samples
        # misaligned (prev keeps the last `pad` samples assuming the chunk
        # ended on a stride boundary) — every later output would be silently
        # shifted. Fail like the transposed-conv sibling does.
        raise ValueError(
            f"streamed conv chunk length {x.shape[-1]} must be a multiple "
            f"of stride {stride}")
    pad = causal_pad_amount(
        params.get("weight_q", params.get("weight")).shape[-1], stride,
        dilation)
    if pad == 0:
        return conv1d(params, x, stride=stride, dilation=dilation, groups=groups), state
    buf = jnp.concatenate([state.prev, x], axis=-1)
    out = conv1d(params, buf, stride=stride, dilation=dilation, groups=groups)
    new_prev = buf[:, :, buf.shape[-1] - pad:]
    return out, ConvState(prev=new_prev)


def make_conv_state(
    c_in: int, kernel: int, stride: int, dilation: int, batch: int, dtype=jnp.float32
) -> ConvState:
    pad = causal_pad_amount(kernel, stride, dilation)
    return ConvState(prev=jnp.zeros((batch, c_in, max(pad, 0)), dtype=dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConvTrState:
    """Carried overlap tail for a causal transposed conv: (B, C_out, K-stride)."""

    partial: jax.Array


def make_convtr_state(
    c_out: int, kernel: int, stride: int, batch: int, dtype=jnp.float32
) -> ConvTrState:
    return ConvTrState(
        partial=jnp.zeros((batch, c_out, max(kernel - stride, 0)), dtype=dtype)
    )


def causal_conv_transpose1d_streaming(
    params: Params,
    x: jax.Array,
    state: ConvTrState,
    *,
    stride: int = 1,
    groups: int = 1,
) -> Tuple[jax.Array, ConvTrState]:
    """Streamed causal transposed conv emitting T*stride samples per call.

    The full transposed conv of a chunk produces (T-1)*stride + K samples;
    the first K-stride overlap the previous chunk's carried tail (added in),
    and the last K-stride are carried forward. Bias is included exactly once
    per output sample (it is added by conv_transpose1d on the emitted part;
    the carried tail keeps only the linear part).
    """
    w = params.get("weight_q", params.get("weight"))
    k = w.shape[-1]
    tail = k - stride
    bias = params.get("bias")
    # no bias yet (added once per emitted sample below); quant fields pass
    # through so the streamed path hits the same int8 conv as the batch one
    p_nobias = {kk: vv for kk, vv in params.items() if kk != "bias"}
    full = conv_transpose1d(
        p_nobias, x, stride=stride, groups=groups
    )  # (B, C_out, (T-1)*stride + K)
    t_out = x.shape[-1] * stride
    if tail > t_out:
        # The overlap-add below assumes the carried tail fits inside this
        # chunk's t_out emitted samples (true for every Mimi kernel, which
        # uses K == 2*stride). A longer tail would duplicate overlap into
        # both the output and the carry — fail instead of streaming
        # silently-wrong audio.
        raise ValueError(
            f"streamed conv-transpose needs K-stride ({tail}) <= "
            f"T*stride ({t_out}); feed larger chunks or use K <= 2*stride")
    if tail > 0:
        head = full[:, :, :tail] + state.partial
        emitted = jnp.concatenate([head, full[:, :, tail:t_out]], axis=-1)
        new_partial = full[:, :, t_out:]
    else:
        emitted = full[:, :, :t_out]
        new_partial = state.partial
    if bias is not None:
        emitted = emitted + bias.astype(emitted.dtype)[None, :, None]
    return emitted, ConvTrState(partial=new_partial)
