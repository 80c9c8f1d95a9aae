"""Fused generation-loop tests (tiny model; no tokenizer/codec needed)."""

import numpy as np
import jax
import jax.numpy as jnp

from csm_mlx_tpu.generation import (
    HISTORY_SIZE,
    _backbone_step,
    _decode_frame,
    _prefill,
    generate_tokens,
    prompt_bucket,
)
from csm_mlx_tpu.ops.kv_cache import KVCache
from csm_mlx_tpu.ops.rope import rope_cache_for
from csm_mlx_tpu.ops.sampling import SamplerConfig


def _prompt(args, s, seed=0):
    rng = np.random.RandomState(seed)
    k = args.n_audio_codebooks + 1
    prompt = np.zeros((s, k), dtype=np.int32)
    prompt[:, -1] = rng.randint(0, 200, size=s)
    mask = np.zeros((s, k), dtype=np.int32)
    mask[:, -1] = 1
    return prompt, mask


def test_generate_tokens_greedy_deterministic(tiny_model):
    prompt, mask = _prompt(tiny_model.args, 5)
    f1, n1 = generate_tokens(tiny_model, prompt, mask, 4, temperature=0.0)
    f2, n2 = generate_tokens(tiny_model, prompt, mask, 4, temperature=0.0)
    assert n1 == n2
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (n1, tiny_model.args.n_audio_codebooks)
    assert n1 >= 1


def test_generate_tokens_token_range(tiny_model):
    prompt, mask = _prompt(tiny_model.args, 3)
    frames, n = generate_tokens(tiny_model, prompt, mask, 3, temperature=0.8,
                                key=jax.random.PRNGKey(1))
    assert frames.min() >= 0
    assert frames.max() < tiny_model.args.n_audio_vocab


def test_context_window_guard(tiny_model):
    import pytest

    prompt, mask = _prompt(tiny_model.args, 500)
    with pytest.raises(ValueError, match="Inputs too long"):
        generate_tokens(tiny_model, prompt, mask, 100)


def test_fused_loop_matches_manual_steps(tiny_model):
    """The while_loop program must produce the same frames as manually
    chaining prefill -> decode_frame -> backbone_step (greedy)."""
    args = tiny_model.args
    params = tiny_model.params
    bcfg = args.backbone_config
    max_frames = 3
    s = 5
    prompt, mask = _prompt(args, s, seed=3)

    frames, n = generate_tokens(tiny_model, prompt, mask, max_frames,
                                temperature=0.0)

    # Manual loop with the un-fused building blocks (pad=0 path).
    bucket = prompt_bucket(s)
    pad = bucket - s
    tokens = np.zeros((1, bucket, prompt.shape[1]), dtype=np.int32)
    tokens[0, pad:] = prompt
    msk = np.zeros_like(tokens)
    msk[0, pad:] = mask
    capacity = bucket + max_frames
    cos_b, sin_b = rope_cache_for(bcfg, max(capacity, bcfg.max_position_embeddings))
    cos_d, sin_d = rope_cache_for(args.decoder_config, args.n_audio_codebooks + 1)
    cache = KVCache.init(bcfg, 1, capacity, dtype=jnp.float32)
    pad_len = jnp.asarray([pad])
    h, cache = _prefill(params, args, jnp.asarray(tokens), jnp.asarray(msk),
                        pad_len, cache, cos_b, sin_b)
    smp = SamplerConfig(temperature=0.0)
    history = jnp.full((1, HISTORY_SIZE), -1, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    manual = []
    for i in range(max_frames):
        frame, key, history = _decode_frame(params, args, h, key, history,
                                            smp, (), cos_d, sin_d)
        if not np.asarray(frame).any():
            break
        manual.append(np.asarray(frame)[0])
        if i + 1 < max_frames:
            zeros = jnp.zeros((1, 1), dtype=frame.dtype)
            nxt = jnp.concatenate([frame, zeros], axis=1)[:, None, :]
            nmask = jnp.concatenate(
                [jnp.ones_like(frame), zeros], axis=1)[:, None, :]
            h, cache = _backbone_step(params, args, nxt, nmask, pad_len,
                                      cache, cos_b, sin_b)
    manual = np.stack(manual) if manual else np.zeros((0, args.n_audio_codebooks))
    assert n == len(manual)
    np.testing.assert_array_equal(frames, manual)


def test_repetition_penalty_changes_output(tiny_model):
    from csm_mlx_tpu.ops.sampling import make_logits_processors

    prompt, mask = _prompt(tiny_model.args, 4, seed=5)
    procs = make_logits_processors(repetition_penalty=2.5)
    base, _ = generate_tokens(tiny_model, prompt, mask, 4, temperature=0.0)
    pen, _ = generate_tokens(tiny_model, prompt, mask, 4, temperature=0.0,
                             logits_processors=procs)
    # With a strong penalty, repeated c0 tokens must differ at some point
    # (greedy without penalty tends to repeat on a random-init model).
    if len(base) > 1 and (base[1:, 0] == base[0, 0]).any():
        assert not np.array_equal(base[:, 0], pen[:, 0])


def test_generate_frame_default_cache_has_decode_headroom(tiny_model):
    """The documented stateful frame-loop idiom with the DEFAULT cache must
    match the fused loop: a default capacity of exactly the prompt length
    would clamp update_layer's write index and silently clobber the last
    prompt KV slot on every frame."""
    from csm_mlx_tpu.generation import generate_frame

    args = tiny_model.args
    prompt, mask = _prompt(args, 5, seed=11)
    fused, n = generate_tokens(tiny_model, prompt, mask, 3, temperature=0.0)

    state = generate_frame(
        tiny_model, jnp.asarray(prompt[None]),
        token_mask=jnp.asarray(mask[None]),
        temperature=0.0, return_state=True)
    frame, cache, key, history = state
    assert cache.capacity > prompt.shape[0]  # decode headroom
    frames = [np.asarray(frame)[0]]
    for _ in range(n - 1):
        zeros = jnp.zeros((1, 1), dtype=frame.dtype)
        nxt = jnp.concatenate([frame, zeros], axis=1)[:, None, :]
        nmask = jnp.concatenate([jnp.ones_like(frame), zeros],
                                axis=1)[:, None, :]
        frame, cache, key, history = generate_frame(
            tiny_model, nxt, token_mask=nmask, temperature=0.0,
            cache=cache, key=key, history=history, return_state=True)
        frames.append(np.asarray(frame)[0])
    np.testing.assert_array_equal(np.stack(frames), fused[:n])


def test_tiered_block_loop_matches_per_frame_loop(tiny_model, monkeypatch):
    """The tiered block-decode generation loop (TPU default; forced here)
    emits exactly the per-frame loop's tokens and counts, including when
    max_frames is not a multiple of the block."""
    from csm_mlx_tpu.generation import (_build_generate_tokens,
                                        generate_tokens_batch)

    args = tiny_model.args
    prompts, masks = zip(*[_prompt(args, 5 + i, seed=20 + i)
                           for i in range(3)])
    key = jax.random.PRNGKey(11)
    fr0, n0 = generate_tokens_batch(tiny_model, list(prompts), list(masks),
                                    13, temperature=0.0, key=key)
    assert fr0.shape[0] == 13
    for blk in ("4", "8"):
        monkeypatch.setenv("CSM_TPU_TIERED_KV", "force")
        monkeypatch.setenv("CSM_TPU_GEN_BLOCK", blk)
        _build_generate_tokens.cache_clear()
        fr1, n1 = generate_tokens_batch(tiny_model, list(prompts),
                                        list(masks), 13, temperature=0.0,
                                        key=key)
        assert fr1.shape == fr0.shape  # padded buffer trimmed to max_frames
        np.testing.assert_array_equal(n1, n0)
        for b in range(3):
            np.testing.assert_array_equal(fr1[:n1[b], b], fr0[:n0[b], b])
    monkeypatch.undo()
    _build_generate_tokens.cache_clear()
