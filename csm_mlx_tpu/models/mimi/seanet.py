"""SEANet convolutional encoder/decoder (Mimi's waveform front/back end).

Published kyutai/mimi architecture: init conv (k=7), four stages of
[residual block(s) + strided downsample] over reversed ratios (encoder) or
[transposed upsample + residual block(s)] over ratios (decoder), ELU
activations, final conv (k=3). All convs are causal; streaming mode carries
per-conv left context / transposed-conv overlap tails so chunked decode is
bit-identical to the batch path (what the reference's `decode_step` /
`reset_state` rely on, `/root/reference/csm_mlx/generation.py:224-258`).

Parameter pytree (static stride/dilation metadata lives in `MimiConfig`,
never in the pytree, so params can be traced by jit):

  {"init": conv, "stages": [{"residual": [{"conv1","conv2"}], "down"|"up"}],
   "final": conv}
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.models.mimi.config import MimiConfig
from csm_mlx_tpu.models.mimi.conv import (
    causal_conv1d_streaming,
    causal_conv_transpose1d,
    causal_conv_transpose1d_streaming,
    conv1d,
    make_conv_state,
    make_convtr_state,
)

Params = Dict[str, Any]
elu = jax.nn.elu


def _enc_ratios(cfg: MimiConfig) -> Tuple[int, ...]:
    return tuple(reversed(cfg.upsampling_ratios))


def _dilation(cfg: MimiConfig, block_idx: int) -> int:
    return cfg.dilation_growth_rate ** block_idx


def _extra_right_pad(t: int, kernel: int, stride: int, dilation: int) -> int:
    """HF/Encodec 'extra padding' so a strided conv covers the full input
    (modeling_mimi.py `_get_extra_padding_for_conv1d`)."""
    eff_k = (kernel - 1) * dilation + 1
    pad_total = eff_k - stride
    n_frames = math.ceil((t - eff_k + pad_total) / stride + 1) - 1
    ideal = n_frames * stride + eff_k - pad_total
    return max(ideal - t, 0)


def _causal_conv_batch(
    p: Params, x: jax.Array, stride: int, dilation: int = 1, groups: int = 1,
    pad_mode: str = "constant",
) -> jax.Array:
    k = p.get("weight_q", p.get("weight")).shape[-1]
    # Causal padding per HF: left = padding_total = eff_k - stride.
    eff_k = (k - 1) * dilation + 1
    left = eff_k - stride
    right = _extra_right_pad(x.shape[-1], k, stride, dilation)
    mode = "edge" if pad_mode == "replicate" else "constant"
    x = jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode=mode)
    return conv1d(p, x, stride=stride, dilation=dilation, groups=groups)


# ---------------------------------------------------------------------------
# Batch forward
# ---------------------------------------------------------------------------


def seanet_encode(params: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """(B, 1, T) waveform -> (B, hidden, T/prod(ratios)) 25 Hz latent."""
    h = _causal_conv_batch(params["init"], x, 1)
    for stage, ratio in zip(params["stages"], _enc_ratios(cfg)):
        for j, block in enumerate(stage["residual"]):
            r = _causal_conv_batch(block["conv1"], elu(h), 1,
                                   dilation=_dilation(cfg, j))
            r = _causal_conv_batch(block["conv2"], elu(r), 1)
            h = h + r
        h = _causal_conv_batch(stage["down"], elu(h), ratio)
    return _causal_conv_batch(params["final"], elu(h), 1)


def seanet_decode(params: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """(B, hidden, F25) latent -> (B, 1, F25 * prod(ratios)) waveform."""
    h = _causal_conv_batch(params["init"], x, 1)
    for stage, ratio in zip(params["stages"], cfg.upsampling_ratios):
        h = causal_conv_transpose1d(stage["up"], elu(h), stride=ratio)
        for j, block in enumerate(stage["residual"]):
            r = _causal_conv_batch(block["conv1"], elu(h), 1,
                                   dilation=_dilation(cfg, j))
            r = _causal_conv_batch(block["conv2"], elu(r), 1)
            h = h + r
    return _causal_conv_batch(params["final"], elu(h), 1)


# ---------------------------------------------------------------------------
# Streaming forward (identical math, explicit state)
# ---------------------------------------------------------------------------


def seanet_decoder_init_state(
    params: Params, cfg: MimiConfig, batch: int, dtype=jnp.float32
) -> List[Any]:
    """Ordered state list matching seanet_decode_streaming's consumption."""
    states: List[Any] = []

    def conv_state(p, stride=1, dilation=1):
        c_out, c_in, k = p.get("weight_q", p.get("weight")).shape
        states.append(make_conv_state(c_in, k, stride, dilation, batch, dtype))

    def convtr_state(p, stride):
        c_in, c_out, k = p.get("weight_q", p.get("weight")).shape
        states.append(make_convtr_state(c_out, k, stride, batch, dtype))

    conv_state(params["init"])
    for stage, ratio in zip(params["stages"], cfg.upsampling_ratios):
        convtr_state(stage["up"], ratio)
        for j, block in enumerate(stage["residual"]):
            conv_state(block["conv1"], dilation=_dilation(cfg, j))
            conv_state(block["conv2"])
    conv_state(params["final"])
    return states


def seanet_decode_streaming(
    params: Params, cfg: MimiConfig, x: jax.Array, states: List[Any]
) -> Tuple[jax.Array, List[Any]]:
    """Chunked decode: x (B, hidden, F) -> (B, 1, F*hop) + new states."""
    new_states: List[Any] = []
    it = iter(states)

    def conv(p, h, stride=1, dilation=1):
        out, st = causal_conv1d_streaming(p, h, next(it), stride=stride,
                                          dilation=dilation)
        new_states.append(st)
        return out

    def convtr(p, h, stride):
        out, st = causal_conv_transpose1d_streaming(p, h, next(it), stride=stride)
        new_states.append(st)
        return out

    h = conv(params["init"], x)
    for stage, ratio in zip(params["stages"], cfg.upsampling_ratios):
        h = convtr(stage["up"], elu(h), ratio)
        for j, block in enumerate(stage["residual"]):
            r = conv(block["conv1"], elu(h), dilation=_dilation(cfg, j))
            r = conv(block["conv2"], elu(r))
            h = h + r
    out = conv(params["final"], elu(h))
    return out, new_states


def seanet_encoder_init_state(
    params: Params, cfg: MimiConfig, batch: int, dtype=jnp.float32
) -> List[Any]:
    states: List[Any] = []

    def conv_state(p, stride=1, dilation=1):
        c_out, c_in, k = p.get("weight_q", p.get("weight")).shape
        states.append(make_conv_state(c_in, k, stride, dilation, batch, dtype))

    conv_state(params["init"])
    for stage, ratio in zip(params["stages"], _enc_ratios(cfg)):
        for j, block in enumerate(stage["residual"]):
            conv_state(block["conv1"], dilation=_dilation(cfg, j))
            conv_state(block["conv2"])
        conv_state(stage["down"], stride=ratio)
    conv_state(params["final"])
    return states


def seanet_encode_streaming(
    params: Params, cfg: MimiConfig, x: jax.Array, states: List[Any]
) -> Tuple[jax.Array, List[Any]]:
    """Chunked encode: x (B, 1, T) with T a multiple of the hop."""
    new_states: List[Any] = []
    it = iter(states)

    def conv(p, h, stride=1, dilation=1):
        out, st = causal_conv1d_streaming(p, h, next(it), stride=stride,
                                          dilation=dilation)
        new_states.append(st)
        return out

    h = conv(params["init"], x)
    for stage, ratio in zip(params["stages"], _enc_ratios(cfg)):
        for j, block in enumerate(stage["residual"]):
            r = conv(block["conv1"], elu(h), dilation=_dilation(cfg, j))
            r = conv(block["conv2"], elu(r))
            h = h + r
        h = conv(stage["down"], elu(h), stride=ratio)
    out = conv(params["final"], elu(h))
    return out, new_states


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key, c_out, c_in, k, dtype):
    fan = c_in * k
    return {
        "weight": (jax.random.normal(key, (c_out, c_in, k)) * fan ** -0.5).astype(dtype),
        "bias": jnp.zeros((c_out,), dtype),
    }


def init_seanet_encoder_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    n = cfg.num_filters
    keys = iter(jax.random.split(key, 64))
    params: Params = {
        "init": _conv_init(next(keys), n, cfg.audio_channels, cfg.kernel_size, dtype),
        "stages": [],
    }
    cur = n
    for ratio in _enc_ratios(cfg):
        blocks = []
        for _ in range(cfg.num_residual_layers):
            hidden = cur // cfg.compress
            blocks.append({
                "conv1": _conv_init(next(keys), hidden, cur,
                                    cfg.residual_kernel_size, dtype),
                "conv2": _conv_init(next(keys), cur, hidden, 1, dtype),
            })
        params["stages"].append({
            "residual": blocks,
            "down": _conv_init(next(keys), cur * 2, cur, ratio * 2, dtype),
        })
        cur *= 2
    params["final"] = _conv_init(next(keys), cfg.hidden_size, cur,
                                 cfg.last_kernel_size, dtype)
    return params


def init_seanet_decoder_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    cur = cfg.num_filters * 2 ** len(cfg.upsampling_ratios)
    params: Params = {
        "init": _conv_init(next(keys), cur, cfg.hidden_size, cfg.kernel_size, dtype),
        "stages": [],
    }
    for ratio in cfg.upsampling_ratios:
        k = ratio * 2
        # Transposed conv weight layout: (C_in, C_out, K).
        w = (jax.random.normal(next(keys), (cur, cur // 2, k))
             * (cur * k) ** -0.5).astype(dtype)
        blocks = []
        for _ in range(cfg.num_residual_layers):
            hidden = (cur // 2) // cfg.compress
            blocks.append({
                "conv1": _conv_init(next(keys), hidden, cur // 2,
                                    cfg.residual_kernel_size, dtype),
                "conv2": _conv_init(next(keys), cur // 2, hidden, 1, dtype),
            })
        params["stages"].append({
            "up": {"weight": w, "bias": jnp.zeros((cur // 2,), dtype)},
            "residual": blocks,
        })
        cur //= 2
    params["final"] = _conv_init(next(keys), cfg.audio_channels, cfg.num_filters,
                                 cfg.last_kernel_size, dtype)
    return params
