"""Pallas flash-prefill attention vs the masked-einsum oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csm_mlx_tpu.ops.attention import (
    NEG_INF,
    causal_mask_bias,
    flash_prefill_sdpa,
    sdpa,
)


def _ref(q, k, v, scale, pad_len):
    b, h, s, d = q.shape
    causal = causal_mask_bias(s, s)
    key_valid = jnp.arange(s)[None, :] >= pad_len[:, None]
    bias = jnp.maximum(
        causal[None, None]
        + jnp.where(key_valid, 0.0, NEG_INF)[:, None, None, :],
        NEG_INF,
    )
    return sdpa(q, k, v, scale=scale, mask_bias=bias)


@pytest.mark.parametrize("b,heads,kv,s,d,pads", [
    (1, 4, 2, 64, 16, [0]),
    (2, 8, 2, 128, 32, [5, 37]),   # GQA group 4, ragged left-pads
    (1, 2, 2, 32, 64, [31]),       # fully-padded except one row
])
def test_flash_prefill_matches_einsum(b, heads, kv, s, d, pads):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, heads, s, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, kv, s, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, kv, s, d).astype(np.float32))
    pad = jnp.asarray(pads, jnp.int32)
    scale = d ** -0.5
    want = np.asarray(_ref(q, k, v, scale, pad))
    got = np.asarray(flash_prefill_sdpa(q, k, v, scale, pad))
    # rows inside the left-pad attend nothing in the flash kernel; the
    # einsum oracle gives them an all-masked softmax too — compare only
    # valid rows (outputs for pad rows are never consumed downstream).
    for bi in range(b):
        p0 = int(pad[bi])
        np.testing.assert_allclose(got[bi, :, p0:], want[bi, :, p0:],
                                   atol=2e-5, rtol=2e-5)


def test_flash_prefill_bf16():
    rng = np.random.RandomState(1)
    b, heads, kv, s, d = 1, 8, 2, 256, 64
    q = jnp.asarray(rng.randn(b, heads, s, d) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, kv, s, d) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, kv, s, d), jnp.bfloat16)
    pad = jnp.asarray([3], jnp.int32)
    scale = d ** -0.5
    want = np.asarray(_ref(q, k, v, scale, pad), np.float32)
    got = np.asarray(flash_prefill_sdpa(q, k, v, scale, pad), np.float32)
    np.testing.assert_allclose(got[:, :, 3:], want[:, :, 3:],
                               atol=2e-2, rtol=2e-2)


def test_prefill_flash_equals_einsum_path_end_to_end():
    """llama_forward with flash_pad_len == the masked-einsum forward."""
    from csm_mlx_tpu.config import LlamaConfig
    from csm_mlx_tpu.models.llama import init_llama_params, llama_forward
    from csm_mlx_tpu.ops.kv_cache import KVCache
    from csm_mlx_tpu.ops.rope import rope_cache_for

    cfg = LlamaConfig(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      intermediate_size=64, hidden_size=64,
                      max_position_embeddings=256)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, s, cap = 2, 64, 96
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, s, 64).astype(np.float32)) * 0.3
    pad = jnp.asarray([0, 11], jnp.int32)
    positions = jnp.arange(s)[None, :] - pad[:, None]
    cos, sin = rope_cache_for(cfg, 128)

    causal = causal_mask_bias(s, cap)
    key_valid = jnp.arange(cap)[None, :] >= pad[:, None]
    bias = jnp.maximum(
        causal[None, None]
        + jnp.where(key_valid, 0.0, NEG_INF)[:, None, None, :], NEG_INF)
    want, cache_w = llama_forward(
        params, cfg, x, cos, sin, positions, bias,
        KVCache.init(cfg, b, cap, dtype=jnp.float32))
    got, cache_g = llama_forward(
        params, cfg, x, cos, sin, positions, None,
        KVCache.init(cfg, b, cap, dtype=jnp.float32), flash_pad_len=pad)
    # valid (non-pad) rows match; pad rows are never consumed
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got[1, 11:]),
                               np.asarray(want[1, 11:]),
                               atol=3e-5, rtol=3e-5)
    # caches match at every slot decode steps can attend (pad slots differ —
    # pad-row activations diverge between the two maskings, but key_valid
    # masks those slots out of every later step)
    kg, kw = np.asarray(cache_g.k), np.asarray(cache_w.k)
    np.testing.assert_allclose(kg[:, 0, :, :s], kw[:, 0, :, :s], atol=2e-5)
    np.testing.assert_allclose(kg[:, 1, :, 11:s], kw[:, 1, :, 11:s],
                               atol=2e-5)
