"""CSM model-stack tests: embedding layout, cache consistency, padding
invariance — the kernel-level checks SURVEY.md §4 calls for."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csm_mlx_tpu.generation import _backbone_step, _prefill
from csm_mlx_tpu.models.csm import (
    CSM,
    embed_audio,
    embed_tokens,
    init_csm_params,
    masked_input_embeds,
)
from csm_mlx_tpu.models.llama import init_llama_params, llama_forward
from csm_mlx_tpu.ops.attention import causal_mask_bias
from csm_mlx_tpu.ops.kv_cache import KVCache
from csm_mlx_tpu.ops.rope import rope_cache_for

from conftest import TINY_BACKBONE, tiny_args


def test_embed_tokens_layout(tiny_model):
    """Slot layout must match models.py:82-92: audio slots 0..K-1 offset by
    codebook*n_audio_vocab into the fused table, text in the last slot."""
    args = tiny_model.args
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(
        rng.randint(0, 60, size=(2, 3, args.n_audio_codebooks + 1)), dtype=jnp.int32
    )
    emb = embed_tokens(tiny_model.params, args, tokens)
    assert emb.shape == (2, 3, args.n_audio_codebooks + 1, args.backbone_dim)

    table = np.asarray(tiny_model.params["audio_embeddings"]["weight"])
    text_table = np.asarray(tiny_model.params["text_embeddings"]["weight"])
    t = np.asarray(tokens)
    for cb in range(args.n_audio_codebooks):
        np.testing.assert_allclose(
            np.asarray(emb)[:, :, cb],
            table[t[:, :, cb] + cb * args.n_audio_vocab],
            rtol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(emb)[:, :, -1], text_table[t[:, :, -1]], rtol=1e-6
    )


def test_embed_audio_offset(tiny_model):
    args = tiny_model.args
    toks = jnp.asarray([3, 5], dtype=jnp.int32)
    got = embed_audio(tiny_model.params, args, 2, toks)
    table = np.asarray(tiny_model.params["audio_embeddings"]["weight"])
    np.testing.assert_allclose(
        np.asarray(got), table[np.asarray(toks) + 2 * args.n_audio_vocab]
    )


def test_masked_sum(tiny_model):
    args = tiny_model.args
    rng = np.random.RandomState(1)
    K = args.n_audio_codebooks + 1
    tokens = jnp.asarray(rng.randint(0, 60, size=(1, 4, K)), dtype=jnp.int32)
    mask = jnp.asarray(rng.randint(0, 2, size=(1, 4, K)), dtype=jnp.int32)
    got = masked_input_embeds(tiny_model.params, args, tokens, mask)
    emb = np.asarray(embed_tokens(tiny_model.params, args, tokens))
    want = (emb * np.asarray(mask)[..., None]).sum(-2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_incremental_decode_matches_full_forward():
    """Static-cache decode must reproduce the full-sequence forward — the
    core correctness property replacing mlx_lm's growing KVCache."""
    cfg = TINY_BACKBONE
    key = jax.random.PRNGKey(0)
    params = init_llama_params(key, cfg, dtype=jnp.float32)
    S = 7
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S, cfg.hidden_size))
    cos, sin = rope_cache_for(cfg, 32)

    full, _ = llama_forward(
        params, cfg, x, cos, sin, jnp.arange(S)[None],
        causal_mask_bias(S, S)[None, None], None,
    )

    cache = KVCache.init(cfg, 1, S, dtype=jnp.float32)
    outs = []
    from csm_mlx_tpu.ops.attention import NEG_INF

    for t in range(S):
        k_idx = jnp.arange(S)
        bias = jnp.where(k_idx <= cache.index, 0.0, NEG_INF)[None, None, None, :]
        h, cache = llama_forward(
            params, cfg, x[:, t : t + 1], cos, sin,
            jnp.asarray([[t]]), bias, cache,
        )
        outs.append(h)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), rtol=2e-4, atol=2e-5)


def test_prefill_left_padding_invariance(tiny_model):
    """Left-padded prefill must give the same last hidden state + equivalent
    downstream decode as the unpadded prompt."""
    args = tiny_model.args
    params = tiny_model.params
    bcfg = args.backbone_config
    rng = np.random.RandomState(3)
    K = args.n_audio_codebooks + 1
    S, PAD = 5, 3
    prompt = rng.randint(0, 60, size=(1, S, K)).astype(np.int32)
    mask = np.ones((1, S, K), dtype=np.int32)

    cos, sin = rope_cache_for(bcfg, 64)

    cache0 = KVCache.init(bcfg, 1, S + 2, dtype=jnp.float32)
    h0, cache0 = _prefill(
        params, args, jnp.asarray(prompt), jnp.asarray(mask),
        jnp.asarray([0]), cache0, cos, sin,
    )

    padded = np.zeros((1, S + PAD, K), dtype=np.int32)
    padded[:, PAD:] = prompt
    pmask = np.zeros((1, S + PAD, K), dtype=np.int32)
    pmask[:, PAD:] = mask
    cache1 = KVCache.init(bcfg, 1, S + PAD + 2, dtype=jnp.float32)
    h1, cache1 = _prefill(
        params, args, jnp.asarray(padded), jnp.asarray(pmask),
        jnp.asarray([PAD]), cache1, cos, sin,
    )
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=2e-4, atol=2e-5)

    # One decode step after prefill must also agree.
    nxt = rng.randint(0, 60, size=(1, 1, K)).astype(np.int32)
    nmask = np.ones((1, 1, K), dtype=np.int32)
    s0, _ = _backbone_step(params, args, jnp.asarray(nxt), jnp.asarray(nmask),
                           jnp.asarray([0]), cache0, cos, sin)
    s1, _ = _backbone_step(params, args, jnp.asarray(nxt), jnp.asarray(nmask),
                           jnp.asarray([PAD]), cache1, cos, sin)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=2e-4, atol=2e-5)


def test_csm_param_shapes():
    args = tiny_args()
    params = init_csm_params(jax.random.PRNGKey(0), args, dtype=jnp.float32)
    assert params["audio_head"].shape == (
        args.n_audio_codebooks - 1, args.decoder_dim, args.n_audio_vocab
    )
    assert params["codebook0_head"]["weight"].shape == (
        args.n_audio_vocab, args.backbone_dim
    )
    assert params["audio_embeddings"]["weight"].shape == (
        args.n_audio_vocab * args.n_audio_codebooks, args.backbone_dim
    )
    assert params["projection"]["weight"].shape == (args.decoder_dim, args.backbone_dim)
