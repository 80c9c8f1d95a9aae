"""Llama-3.1 scaled rotary position embeddings.

Numerically reproduces the reference torchtune-style implementation
(`/root/reference/csm_mlx/attention.py:57-177`): frequencies are computed in
fp32, scaled with the Llama-3.1 wavelength rule, and applied with the
*pair-interleaved* rotation convention — x is viewed as (..., d/2, 2) pairs
(x[..., 0::2] real parts, x[..., 1::2] imaginary parts), NOT the
half-split convention used by HF Llama.

TPU notes: the cos/sin cache is precomputed once per config (fp32, shape
(max_seq, d/2)) and gathered by position ids, so nothing here recomputes
transcendentals inside the decode loop. Rotation is a fused elementwise op —
XLA folds it into the surrounding matmul epilogues.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.config import LlamaConfig, RopeScalingConfig


def llama3_scaled_freqs(
    head_dim: int,
    base: float,
    scaling: RopeScalingConfig | None,
) -> np.ndarray:
    """Inverse frequencies with Llama-3.1 scaling.

    Vectorized equivalent of the reference's per-frequency loop
    (`attention.py:94-117`): frequencies whose wavelength exceeds
    `old_context_len / low_freq_factor` are divided by `factor`; wavelengths
    below `old_context_len / high_freq_factor` are kept; in between, a linear
    blend by the smoothing coefficient.
    """
    freqs = 1.0 / (
        base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float32) / head_dim)
    )
    if scaling is None or scaling.rope_type != "llama3":
        return freqs.astype(np.float32)

    old_context_len = float(scaling.original_max_position_embeddings)
    low_freq_wavelen = old_context_len / scaling.low_freq_factor
    high_freq_wavelen = old_context_len / scaling.high_freq_factor

    wavelen = 2.0 * math.pi / freqs
    smooth = (old_context_len / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    blended = (1.0 - smooth) * freqs / scaling.factor + smooth * freqs
    scaled = np.where(
        wavelen < high_freq_wavelen,
        freqs,
        np.where(wavelen > low_freq_wavelen, freqs / scaling.factor, blended),
    )
    return scaled.astype(np.float32)


@functools.lru_cache(maxsize=16)
def rope_cache(
    head_dim: int,
    base: float,
    scaling: RopeScalingConfig | None,
    max_seq_len: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape (max_seq_len, head_dim//2), fp32.

    Matches `attention.py:81-92`: outer product of positions and theta.
    Cached host-side; becomes a jit constant.
    """
    theta = llama3_scaled_freqs(head_dim, base, scaling)
    pos = np.arange(max_seq_len, dtype=np.float32)
    idx_theta = np.outer(pos, theta).astype(np.float32)
    return np.cos(idx_theta), np.sin(idx_theta)


def rope_cache_for(cfg: LlamaConfig, max_seq_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    cos, sin = rope_cache(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling, max_seq_len)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Rotate q/k by position.

    Args:
      x: (B, S, H, D) query or key tensor (any float dtype).
      cos/sin: (max_seq, D//2) fp32 tables.
      positions: (B, S) or (S,) int32 absolute positions. Positions are
        clamped to >= 0 so left-padding can use negative fillers (those slots
        are masked out of attention anyway).

    Interleaved-pair rotation, computed in fp32 and cast back
    (`attention.py:148-177`).
    """
    if positions.ndim == 1:
        positions = positions[None, :]
    positions = jnp.maximum(positions, 0)
    c = cos[positions][:, :, None, :]  # (B, S, 1, D/2)
    s = sin[positions][:, :, None, :]

    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    out0 = x0 * c - x1 * s
    out1 = x1 * c + x0 * s
    # Re-interleave: stack on a trailing axis then flatten the pair dim.
    out = jnp.stack([out0, out1], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
