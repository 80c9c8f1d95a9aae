"""RoPE parity tests against an independent port of the reference math
(`/root/reference/csm_mlx/attention.py:57-177`)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from csm_mlx_tpu.config import RopeScalingConfig
from csm_mlx_tpu.ops.rope import apply_rope, llama3_scaled_freqs, rope_cache


def reference_scaled_freqs(dim, base, scale_factor, low, high, old_ctx):
    """Direct per-frequency loop port of attention.py:94-117."""
    freqs = 1.0 / (base ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim))
    low_freq_wavelen = old_ctx / low
    high_freq_wavelen = old_ctx / high
    out = []
    for freq in freqs:
        wavelen = 2 * math.pi / freq
        if wavelen < high_freq_wavelen:
            out.append(freq)
        elif wavelen > low_freq_wavelen:
            out.append(freq / scale_factor)
        else:
            smooth = (old_ctx / wavelen - low) / (high - low)
            out.append((1 - smooth) * freq / scale_factor + smooth * freq)
    return np.array(out, dtype=np.float32)


def reference_apply(x, cos, sin, offset):
    """Port of attention.py:148-177 (pair-interleaved rotation)."""
    b, s, h, d = x.shape
    xs = x.astype(np.float32).reshape(b, s, h, d // 2, 2)
    c = cos[offset : offset + s].reshape(1, s, 1, d // 2)
    sn = sin[offset : offset + s].reshape(1, s, 1, d // 2)
    out = np.stack(
        [xs[..., 0] * c - xs[..., 1] * sn, xs[..., 1] * c + xs[..., 0] * sn],
        axis=-1,
    )
    return out.reshape(b, s, h, d)


def test_llama3_scaling_matches_reference_loop():
    for dim, base in [(64, 500_000.0), (128, 500_000.0), (64, 10_000.0)]:
        scaling = RopeScalingConfig(factor=32.0, low_freq_factor=1.0,
                                    high_freq_factor=4.0,
                                    original_max_position_embeddings=8192)
        got = llama3_scaled_freqs(dim, base, scaling)
        want = reference_scaled_freqs(dim, base, 32.0, 1.0, 4.0, 8192)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_no_scaling_passthrough():
    got = llama3_scaled_freqs(64, 10_000.0, None)
    want = 1.0 / (10_000.0 ** (np.arange(0, 64, 2).astype(np.float32) / 64))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_apply_rope_matches_reference_rotation():
    dim, base = 32, 500_000.0
    scaling = RopeScalingConfig()
    cos, sin = rope_cache(dim, base, scaling, 64)
    x = np.random.RandomState(0).randn(2, 5, 3, dim).astype(np.float32)
    for offset in [0, 7]:
        positions = jnp.arange(5) + offset
        got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                    jnp.asarray(sin), positions))
        want = reference_apply(x, cos, sin, offset)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_apply_rope_negative_positions_clamped():
    """Left-pad slots carry negative positions; they must not NaN/crash."""
    dim = 16
    cos, sin = rope_cache(dim, 10_000.0, None, 32)
    x = jnp.ones((1, 4, 2, dim))
    positions = jnp.array([[-2, -1, 0, 1]])
    out = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin), positions)
    assert bool(jnp.all(jnp.isfinite(out)))
    # Position 0 rotation == identity at angle 0 for the first pair entries.
    np.testing.assert_allclose(np.asarray(out)[0, 2], np.asarray(out)[0, 0])
