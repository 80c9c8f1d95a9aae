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


# ---------------------------------------------------------------------------
# Bucketed decode attention (static live-KV-prefix reads) vs the full read
# ---------------------------------------------------------------------------

from csm_mlx_tpu.ops.attention import kv_bucket_for, kv_prefix_buckets


def test_kv_prefix_buckets_shape():
    assert kv_prefix_buckets(512) == ()          # small cache: full read
    bs = kv_prefix_buckets(1890)
    assert bs[0] == 512 and bs[-1] == 1890
    assert all(a < b for a, b in zip(bs, bs[1:]))
    assert kv_prefix_buckets(1890, min_capacity=4096) == ()


def test_kv_prefix_buckets_env_opt_out(monkeypatch):
    monkeypatch.setenv("CSM_TPU_KV_BUCKETS", "0")
    assert kv_prefix_buckets(1890) == ()


def test_kv_bucket_for():
    bs = (512, 768, 1024, 1280)
    assert kv_bucket_for(1, bs) == 512
    assert kv_bucket_for(512, bs) == 512
    assert kv_bucket_for(513, bs) == 768
    assert kv_bucket_for(1280, bs) == 1280
    assert kv_bucket_for(9999, bs) == 1280   # clamped to capacity
    assert kv_bucket_for(640, ()) is None    # buckets disabled


@pytest.mark.parametrize("kv_live,kv_len", [(1, 512), (300, 512),
                                            (512, 512), (513, 768),
                                            (900, 1024), (1280, 1280)])
def test_static_prefix_sdpa_matches_full_read(kv_live, kv_len):
    """Dead positions contribute exactly 0 (exp(NEG_INF) == 0), so slicing
    them off changes only the reduction order — the outputs must agree to
    ULP-level tolerance (bit-identity does not survive XLA re-tiling the
    shorter contraction). This is why sizing the cache
    buffer to a bucket (continuous.py) cannot change the token stream
    beyond fp noise."""
    rng = np.random.RandomState(kv_live)
    b, heads, kvh, cap, d = 3, 8, 2, 1280, 32
    q = jnp.asarray(rng.randn(b, heads, 1, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32))
    # decode-shaped mask: per-row left pads + nothing beyond the live end
    pads = jnp.asarray(rng.randint(0, max(1, kv_live), (b,)), jnp.int32)
    k_idx = jnp.arange(cap, dtype=jnp.int32)
    valid = (k_idx[None] >= pads[:, None]) & (k_idx[None] < kv_live)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None]
    scale = d ** -0.5
    full = np.asarray(sdpa(q, k, v, scale, bias))
    got = np.asarray(sdpa(q, k[:, :, :kv_len], v[:, :, :kv_len], scale,
                          bias[..., :kv_len]))
    np.testing.assert_allclose(got, full, rtol=2e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Flash-decode kernel (batched single-position decode) vs the einsum oracle
# ---------------------------------------------------------------------------

from csm_mlx_tpu.ops.attention import flash_decode_sdpa


@pytest.mark.parametrize("b,heads,kvh,cap,d,index", [
    (8, 8, 2, 128, 32, 64),      # GQA group 4
    (3, 4, 4, 96, 16, 95),       # MHA, index at the last slot
    (2, 8, 1, 256, 64, 0),       # single kv head, first decode step
])
def test_flash_decode_matches_einsum(b, heads, kvh, cap, d, index):
    rng = np.random.RandomState(index + cap)
    q = jnp.asarray(rng.randn(b, heads, 1, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32))
    pad = jnp.asarray(rng.randint(0, index + 1, (b,)), jnp.int32)
    # the decode-step mask of generation._backbone_step
    k_idx = jnp.arange(cap, dtype=jnp.int32)
    valid = (k_idx[None] >= pad[:, None]) & (k_idx[None] <= index)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None]
    scale = d ** -0.5
    want = np.asarray(sdpa(q, k, v, scale, bias))
    got = np.asarray(flash_decode_sdpa(q, k, v, scale, pad,
                                       jnp.asarray(index, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_decode_bf16():
    rng = np.random.RandomState(5)
    b, heads, kvh, cap, d = 4, 8, 2, 128, 64
    q = jnp.asarray(rng.randn(b, heads, 1, d) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, kvh, cap, d) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, kvh, cap, d), jnp.bfloat16)
    pad = jnp.asarray([0, 3, 17, 64], jnp.int32)
    index = jnp.asarray(80, jnp.int32)
    k_idx = jnp.arange(cap, dtype=jnp.int32)
    valid = (k_idx[None] >= pad[:, None]) & (k_idx[None] <= index)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None]
    scale = d ** -0.5
    want = np.asarray(sdpa(q, k, v, scale, bias), np.float32)
    got = np.asarray(flash_decode_sdpa(q, k, v, scale, pad, index),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_backbone_step_flash_decode_parity(tiny_model, monkeypatch):
    """_backbone_step with the flash-decode kernel (interpret mode on CPU)
    matches the einsum path on the same cache state."""
    import dataclasses

    from csm_mlx_tpu.generation import _backbone_step
    from csm_mlx_tpu.ops.kv_cache import KVCache
    from csm_mlx_tpu.ops.rope import rope_cache_for

    model = tiny_model
    args = model.args
    bcfg = args.backbone_config
    cap = 96
    cos_b, sin_b = rope_cache_for(bcfg, max(cap,
                                            bcfg.max_position_embeddings))
    rng = np.random.RandomState(0)
    b = 8  # >= the kernel's MIN_B gate
    tokens = jnp.asarray(rng.randint(1, 100, (b, 1, args.n_audio_codebooks
                                               + 1)), jnp.int32)
    mask = jnp.ones_like(tokens)
    pad = jnp.asarray(rng.randint(0, 30, (b,)), jnp.int32)

    def run():
        cache = KVCache.init(bcfg, b, cap, dtype=jnp.float32)
        cache = dataclasses.replace(cache, index=jnp.asarray(40, jnp.int32))
        hidden, _ = _backbone_step(model.params, args, tokens, mask, pad,
                                   cache, cos_b, sin_b)
        return np.asarray(hidden)

    monkeypatch.setenv("CSM_TPU_FLASH_DECODE", "interpret")  # CPU opt-in
    on = run()
    monkeypatch.setenv("CSM_TPU_FLASH_DECODE", "0")
    off = run()
    np.testing.assert_allclose(on, off, rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# Tiered (block-decode) attention vs the single-buffer oracle
# ---------------------------------------------------------------------------

from csm_mlx_tpu.ops.attention import tiered_sdpa
from csm_mlx_tpu.ops.kv_cache import KVCache, TieredKVCache


@pytest.mark.parametrize("j", [0, 2, 3])
def test_tiered_sdpa_matches_single_buffer(j):
    """[big | recent] with one softmax must equal the single-buffer path
    whose positions [base, base+j] hold the recent rows (same valid-logit
    set; reduction order differs at ULP level)."""
    rng = np.random.RandomState(j)
    b, heads, kvh, cap, win, d, base = 3, 8, 2, 96, 4, 32, 60
    q = jnp.asarray(rng.randn(b, heads, 1, d).astype(np.float32)) * 0.3
    kb = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32)) * 0.3
    vb = jnp.asarray(rng.randn(b, kvh, cap, d).astype(np.float32))
    kr = jnp.asarray(rng.randn(b, kvh, win, d).astype(np.float32)) * 0.3
    vr = jnp.asarray(rng.randn(b, kvh, win, d).astype(np.float32))
    pad = jnp.asarray(rng.randint(0, base, (b,)), jnp.int32)
    kpos = jnp.arange(cap, dtype=jnp.int32)
    big_ok = (kpos[None] >= pad[:, None]) & (kpos[None] < base)
    big_bias = jnp.where(big_ok, 0.0, NEG_INF).astype(jnp.float32)[
        :, None, None]
    scale = d ** -0.5
    got = np.asarray(tiered_sdpa(q, (kb, kr), (vb, vr), scale, big_bias,
                                 jnp.asarray(j, jnp.int32)))
    # oracle: splice recent into the big buffer and run plain sdpa
    k1 = kb.at[:, :, base:base + win].set(kr)
    v1 = vb.at[:, :, base:base + win].set(vr)
    ok = (kpos[None] >= pad[:, None]) & (kpos[None] <= base + j)
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None]
    want = np.asarray(sdpa(q, k1, v1, scale, bias))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)


def test_tiered_kv_cache_mechanics():
    """wrap -> per-layer writes -> merge equals the same writes applied
    directly to a classic KVCache (writes are attention-independent)."""
    from csm_mlx_tpu.config import LlamaConfig

    cfg = LlamaConfig(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8,
                      intermediate_size=32, hidden_size=32,
                      max_position_embeddings=64)
    rng = np.random.RandomState(0)
    base = KVCache.init(cfg, 3, 32, dtype=jnp.float32)
    import dataclasses as dc
    base = dc.replace(base, index=jnp.asarray(10, jnp.int32))
    t = TieredKVCache.wrap(base, window=4)
    classic = base
    for step in range(3):
        for li in range(2):
            kn = jnp.asarray(rng.randn(3, 2, 1, 8), jnp.float32)
            vn = jnp.asarray(rng.randn(3, 2, 1, 8), jnp.float32)
            t, (tkb, tkr), (tvb, tvr) = t.update_layer(li, kn, vn)
            classic, ck, cv = classic.update_layer(li, kn, vn)
            assert tkr.shape == (3, 2, 4, 8) and tkb.shape == ck.shape
        t = t.advance(1)
        classic = classic.advance(1)
    merged = t.merge()
    np.testing.assert_array_equal(np.asarray(merged.k),
                                  np.asarray(classic.k))
    np.testing.assert_array_equal(np.asarray(merged.v),
                                  np.asarray(classic.v))
    assert int(merged.index) == int(classic.index) == 13


def test_backbone_step_tiered_block_parity(tiny_model):
    """A K-step block through the tiered view (wrap -> steps -> merge)
    matches the classic carried-cache chain: hidden states to fp
    tolerance, merged cache close to the classic cache."""
    import dataclasses as dc

    from csm_mlx_tpu.generation import _backbone_step
    from csm_mlx_tpu.ops.rope import rope_cache_for

    model = tiny_model
    args = model.args
    bcfg = args.backbone_config
    cap, base, K = 96, 40, 4
    cos_b, sin_b = rope_cache_for(bcfg, max(cap,
                                            bcfg.max_position_embeddings))
    rng = np.random.RandomState(0)
    b = 2
    pad = jnp.asarray([3, 11], jnp.int32)

    def toks(i):
        t = jnp.asarray(rng.randint(1, 100, (b, 1, args.n_audio_codebooks
                                             + 1)), jnp.int32)
        return t, jnp.ones_like(t)

    steps = [toks(i) for i in range(K)]

    c0 = KVCache.init(bcfg, b, cap, dtype=jnp.float32)
    c0 = dc.replace(c0, index=jnp.asarray(base, jnp.int32),
                    k=jnp.asarray(rng.randn(*c0.k.shape), jnp.float32),
                    v=jnp.asarray(rng.randn(*c0.v.shape), jnp.float32))

    classic, hs_c = c0, []
    for t, m in steps:
        h, classic = _backbone_step(model.params, args, t, m, pad,
                                    classic, cos_b, sin_b)
        hs_c.append(np.asarray(h))

    tier, hs_t = TieredKVCache.wrap(c0, K), []
    for t, m in steps:
        h, tier = _backbone_step(model.params, args, t, m, pad,
                                 tier, cos_b, sin_b)
        hs_t.append(np.asarray(h))
    merged = tier.merge()

    for hc, ht in zip(hs_c, hs_t):
        np.testing.assert_allclose(ht, hc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.k), np.asarray(classic.k),
                               rtol=1e-4, atol=1e-5)
    assert int(merged.index) == int(classic.index)
