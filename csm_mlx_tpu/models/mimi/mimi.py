"""Mimi neural audio codec: 24 kHz waveform <-> 32 RVQ codebooks @ 12.5 Hz.

Full TPU-native reimplementation of the codec the reference consumes from
`moshi_mlx` (`/root/reference/csm_mlx/tokenizers.py:14-21`):

  encode: (B, 1, T) --SEANet--> 25 Hz latent --transformer--> --down(x2)-->
          12.5 Hz --split-RVQ--> (B, K, F)
  decode: (B, K, F) --RVQ-sum--> --up(x2, grouped)--> --transformer-->
          --SEANet--> (B, 1, T)

plus the stateful incremental `encode_step`/`decode_step` used by
`stream_generate` (`generation.py:249-256`) with explicit state pytrees
instead of module mutation (`reset_state` == build a fresh state).

The batch paths are shape-bucketed jit programs; the streaming step is a
single fixed-shape jit program (one 80 ms frame in/out).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.models.mimi.config import MimiConfig, mimi_202407
from csm_mlx_tpu.models.mimi.conv import (
    ConvState,
    ConvTrState,
    causal_conv1d_streaming,
    causal_conv_transpose1d_streaming,
    make_conv_state,
    make_convtr_state,
)
from csm_mlx_tpu.models.mimi.rvq import (
    init_split_rvq_params,
    split_rvq_decode,
    split_rvq_encode,
)
from csm_mlx_tpu.models.mimi.seanet import (
    _causal_conv_batch,
    causal_conv_transpose1d,
    init_seanet_decoder_params,
    init_seanet_encoder_params,
    seanet_decode,
    seanet_decode_streaming,
    seanet_decoder_init_state,
    seanet_encode,
    seanet_encode_streaming,
    seanet_encoder_init_state,
)
from csm_mlx_tpu.models.mimi.transformer import (
    RingKVCache,
    init_transformer_params,
    transformer_forward,
)

Params = Dict[str, Any]
FRAME_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in FRAME_BUCKETS:
        if n <= b:
            return b
    return n


# ---------------------------------------------------------------------------
# Streaming state pytrees
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MimiDecodeState:
    transformer: RingKVCache
    upsample: ConvTrState
    seanet: List[Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MimiEncodeState:
    transformer: RingKVCache
    downsample: ConvState
    downsample_filled: jax.Array  # () bool — replicate-pad bootstrap
    seanet: List[Any]


# ---------------------------------------------------------------------------
# Functional encode / decode
# ---------------------------------------------------------------------------


def mimi_encode_fn(params: Params, cfg: MimiConfig, audio: jax.Array,
                   num_quantizers: int) -> jax.Array:
    """(B, 1, T) -> (B, K, F) int32 codes."""
    latent = seanet_encode(params["encoder"], cfg, audio)  # (B, D, F25)
    h, _ = transformer_forward(params["encoder_transformer"], cfg,
                               latent.transpose(0, 2, 1))
    latent = h.transpose(0, 2, 1)
    latent = _causal_conv_batch(params["downsample"], latent,
                                cfg.downsample_stride, pad_mode="replicate")
    return split_rvq_encode(params["quantizer"], latent, num_quantizers)


def mimi_decode_fn(params: Params, cfg: MimiConfig, codes: jax.Array) -> jax.Array:
    """(B, K, F) -> (B, 1, T) waveform."""
    latent = split_rvq_decode(params["quantizer"], codes)  # (B, D, F)
    latent = causal_conv_transpose1d(
        params["upsample"], latent, stride=cfg.downsample_stride,
        groups=cfg.upsample_groups,
    )
    h, _ = transformer_forward(params["decoder_transformer"], cfg,
                               latent.transpose(0, 2, 1))
    return seanet_decode(params["decoder"], cfg, h.transpose(0, 2, 1))


def mimi_decode_step_fn(
    params: Params, cfg: MimiConfig, codes: jax.Array, state: MimiDecodeState
) -> Tuple[jax.Array, MimiDecodeState]:
    """Incremental decode of F frames: (B, K, F) -> (B, 1, F*frame_size).

    Every streaming primitive underneath is chunk-length generic, so F > 1
    decodes a whole block in one call (fewer, wider matmuls/convs — the
    continuous engine decodes its K-frame step block this way). F is
    bounded by the decode state's ring slack (`init_decode_state`'s
    chunk_frames)."""
    latent = split_rvq_decode(params["quantizer"], codes)  # (B, D, 1)
    latent, up_state = causal_conv_transpose1d_streaming(
        params["upsample"], latent, state.upsample,
        stride=cfg.downsample_stride, groups=cfg.upsample_groups,
    )  # (B, D, 2)
    h, tcache = transformer_forward(
        params["decoder_transformer"], cfg, latent.transpose(0, 2, 1),
        cache=state.transformer,
    )
    audio, seanet_states = seanet_decode_streaming(
        params["decoder"], cfg, h.transpose(0, 2, 1), state.seanet
    )
    return audio, MimiDecodeState(transformer=tcache, upsample=up_state,
                                  seanet=seanet_states)


def mimi_encode_step_fn(
    params: Params, cfg: MimiConfig, audio: jax.Array, state: MimiEncodeState,
    num_quantizers: int,
) -> Tuple[jax.Array, MimiEncodeState]:
    """One-frame incremental encode: (B, 1, frame_size) -> (B, K, 1)."""
    latent, seanet_states = seanet_encode_streaming(
        params["encoder"], cfg, audio, state.seanet
    )  # (B, D, 2)
    h, tcache = transformer_forward(
        params["encoder_transformer"], cfg, latent.transpose(0, 2, 1),
        cache=state.transformer,
    )
    latent = h.transpose(0, 2, 1)
    # Streamed replicate-padded downsample: bootstrap the carried context
    # with the first sample on the very first frame.
    prev = jnp.where(
        state.downsample_filled,
        state.downsample.prev,
        jnp.broadcast_to(latent[:, :, :1], state.downsample.prev.shape),
    )
    latent, ds_state = causal_conv1d_streaming(
        params["downsample"], latent, ConvState(prev=prev),
        stride=cfg.downsample_stride,
    )
    codes = split_rvq_encode(params["quantizer"], latent, num_quantizers)
    return codes, MimiEncodeState(
        transformer=tcache, downsample=ds_state,
        downsample_filled=jnp.ones((), jnp.bool_), seanet=seanet_states,
    )


def reset_decode_row(state: MimiDecodeState, row) -> MimiDecodeState:
    """Recycle one batch row of a streaming decode state for a new stream.

    Continuous batching admits a new logical stream into a finished row of a
    shared batched state. The conv/SEANet carries reset to their t=0 value
    (zeros); the transformer ring keeps the shared absolute `index` but sets
    the row's `start` there, so the sliding-window mask hides the dead
    predecessor's keys. Rotary attention is relative, so the row is then
    numerically a fresh stream (up to rotary phase rounding). `row` may be a
    traced index — the whole function is jittable.
    """
    tr = state.transformer
    tr = dataclasses.replace(
        tr,
        start=tr.start.at[row].set(tr.index),
        k=tr.k.at[:, row].set(0),
        v=tr.v.at[:, row].set(0),
    )
    zero_row = lambda leaf: leaf.at[row].set(jnp.zeros((), leaf.dtype))
    return MimiDecodeState(
        transformer=tr,
        upsample=jax.tree_util.tree_map(zero_row, state.upsample),
        seanet=jax.tree_util.tree_map(zero_row, state.seanet),
    )


# ---------------------------------------------------------------------------
# Public class (facade the tokenizer layer builds on)
# ---------------------------------------------------------------------------


class Mimi:
    """Stateless-parameters Mimi codec with jitted, bucketed entry points."""

    def __init__(self, cfg: MimiConfig, params: Optional[Params] = None,
                 dtype=jnp.float32, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.dtype = dtype
        if params is None:
            params = init_mimi_params(
                rng if rng is not None else jax.random.PRNGKey(0), cfg, dtype
            )
        self.params = params
        self.frame_size = cfg.frame_size
        self._encode_jit = functools.lru_cache(maxsize=16)(self._make_encode)
        self._decode_fn = jax.jit(
            lambda p, c: mimi_decode_fn(p, self.cfg, c))
        self._decode_step_jit = None
        self._encode_step_jit = None

    # -- batch ----------------------------------------------------------
    def _resolve_nq(self, num_quantizers) -> int:
        nq = (self.cfg.num_quantizers if num_quantizers is None
              else num_quantizers)
        if not 1 <= nq <= self.cfg.num_quantizers:
            raise ValueError(
                f"num_quantizers={nq} out of range [1, "
                f"{self.cfg.num_quantizers}]")
        return nq

    def _make_encode(self, nq: int):
        return jax.jit(
            lambda p, x: mimi_encode_fn(p, self.cfg, x, nq)
        )

    def encode(self, audio, num_quantizers: Optional[int] = None) -> jax.Array:
        """(B, 1, T) waveform -> (B, K, F) codes. T padded to whole frames."""
        nq = self._resolve_nq(num_quantizers)
        audio = jnp.asarray(audio, dtype=jnp.float32)
        t = audio.shape[-1]
        frames = -(-t // self.frame_size)
        pad_t = _bucket(frames) * self.frame_size - t
        if pad_t:
            audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad_t)))
        codes = self._encode_jit(nq)(self.params, audio)
        return codes[:, :, :frames]

    def decode(self, codes) -> jax.Array:
        """(B, K, F) codes -> (B, 1, F * frame_size) waveform."""
        codes = jnp.asarray(codes, dtype=jnp.int32)
        f = codes.shape[-1]
        pad_f = _bucket(f) - f
        if pad_f:
            codes = jnp.pad(codes, ((0, 0), (0, 0), (0, pad_f)))
        audio = self._decode_fn(self.params, codes)
        return audio[:, :, : f * self.frame_size]

    # -- streaming ------------------------------------------------------
    def init_decode_state(self, batch: int = 1,
                          chunk_frames: int = 1) -> MimiDecodeState:
        """`chunk_frames`: the largest number of frames a single
        `mimi_decode_step_fn` call will decode with this state (each frame
        is `downsample_stride` transformer tokens); sizes the ring slack."""
        slack = max(8, self.cfg.downsample_stride * chunk_frames)
        return MimiDecodeState(
            transformer=RingKVCache.init(self.cfg, batch, dtype=self.dtype,
                                         slack=slack),
            upsample=make_convtr_state(
                self.cfg.hidden_size, 2 * self.cfg.downsample_stride,
                self.cfg.downsample_stride, batch, self.dtype,
            ),
            seanet=seanet_decoder_init_state(
                self.params["decoder"], self.cfg, batch, self.dtype
            ),
        )

    def init_encode_state(self, batch: int = 1) -> MimiEncodeState:
        return MimiEncodeState(
            transformer=RingKVCache.init(self.cfg, batch, dtype=self.dtype),
            downsample=make_conv_state(
                self.cfg.hidden_size, 2 * self.cfg.downsample_stride,
                self.cfg.downsample_stride, 1, batch, self.dtype,
            ),
            downsample_filled=jnp.zeros((), jnp.bool_),
            seanet=seanet_encoder_init_state(
                self.params["encoder"], self.cfg, batch, self.dtype
            ),
        )

    def decode_step(self, codes, state: Optional[MimiDecodeState] = None):
        """(B, K, 1) codes -> ((B, 1, frame_size) audio, state').

        With `state=None`, an internal stream state is used and updated —
        the stateful interface the reference's Mimi exposes
        (`decode_step`/`reset_state`, generation.py:249-258). Call
        `reset_state()` between utterances in that mode.
        """
        stateful = state is None
        if stateful:
            if getattr(self, "_stream_decode_state", None) is None:
                self._stream_decode_state = self.init_decode_state(
                    batch=jnp.asarray(codes).shape[0])
            state = self._stream_decode_state
        # No donation: in the explicit-state mode the caller owns `state`
        # and may legitimately reuse it (branching two continuations from a
        # common prefix, retries) — donating would delete it under them.
        if self._decode_step_jit is None:
            self._decode_step_jit = jax.jit(
                lambda p, c, s: mimi_decode_step_fn(p, self.cfg, c, s))
        audio, new_state = self._decode_step_jit(
            self.params, jnp.asarray(codes, jnp.int32), state)
        if stateful:
            self._stream_decode_state = new_state
            return audio
        return audio, new_state

    def encode_step(self, audio, state: Optional[MimiEncodeState] = None,
                    num_quantizers: Optional[int] = None):
        """(B, 1, frame_size) audio -> ((B, K, 1) codes, state').

        `state=None` uses the internal stream state (see decode_step)."""
        nq = self._resolve_nq(num_quantizers)
        stateful = state is None
        if stateful:
            if getattr(self, "_stream_encode_state", None) is None:
                self._stream_encode_state = self.init_encode_state(
                    batch=jnp.asarray(audio).shape[0])
            state = self._stream_encode_state
        # one compiled step per nq — a single cached closure would silently
        # keep the first call's num_quantizers
        if self._encode_step_jit is None:
            self._encode_step_jit = {}
        if nq not in self._encode_step_jit:
            # no donation: the caller owns explicit state (see decode_step)
            self._encode_step_jit[nq] = jax.jit(
                lambda p, a, s, _nq=nq: mimi_encode_step_fn(
                    p, self.cfg, a, s, _nq))
        codes, new_state = self._encode_step_jit[nq](
            self.params, jnp.asarray(audio, jnp.float32), state)
        if stateful:
            self._stream_encode_state = new_state
            return codes
        return codes, new_state

    def reset_state(self) -> None:
        """Drop internal streaming states (reference Mimi.reset_state)."""
        self._stream_decode_state = None
        self._stream_encode_state = None

    # -- weights --------------------------------------------------------
    def load_pytorch_weights(self, path: str) -> "Mimi":
        from csm_mlx_tpu.models.mimi.weights import load_mimi_checkpoint

        self.params = load_mimi_checkpoint(path, self.cfg, dtype=self.dtype)
        return self


def init_mimi_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    d = cfg.hidden_size
    s = cfg.downsample_stride
    return {
        "encoder": init_seanet_encoder_params(ks[0], cfg, dtype),
        "decoder": init_seanet_decoder_params(ks[1], cfg, dtype),
        "encoder_transformer": init_transformer_params(ks[2], cfg, dtype),
        "decoder_transformer": init_transformer_params(ks[3], cfg, dtype),
        "quantizer": init_split_rvq_params(ks[4], cfg, dtype),
        # downsample: plain conv, no bias; upsample: grouped convtr, no bias.
        "downsample": {
            "weight": (jax.random.normal(ks[5], (d, d, 2 * s)) * (d * 2 * s) ** -0.5
                       ).astype(dtype)
        },
        "upsample": {
            "weight": (
                jax.random.normal(ks[6], (d, d // cfg.upsample_groups, 2 * s))
                * (2 * s) ** -0.5
            ).astype(dtype)
        },
    }
