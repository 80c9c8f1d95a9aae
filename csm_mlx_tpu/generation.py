"""Autoregressive TTS generation: `generate_frame`, `generate`, `stream_generate`.

Capability parity with `/root/reference/csm_mlx/generation.py:21-258`, engineered
for XLA's trace-once model instead of MLX's lazy eager mode:

- The reference runs a Python frame loop with dynamically growing KV caches
  and a 31-iteration Python decoder loop per frame. Here the *entire*
  generation — prefill, per-frame backbone step, the 31-step decoder inner
  loop (`lax.scan`), sampling, EOS detection — is one compiled XLA program
  driven by `lax.while_loop`. Zero host/device round-trips until the final
  token buffer is read.
- Prompts are left-padded to a small set of bucket lengths so each bucket
  compiles exactly once; the KV cache is static (`ops/kv_cache.py`) with
  capacity `bucket + max_frames`.
- EOS is the reference's all-zero frame rule (generation.py:151-152); the
  context-window guard reproduces generation.py:131-137.
- Sampling follows the documented surface: a pluggable `sampler=` plus
  `logits_processors=` with c0-history carry (see ops/sampling.py). Passing
  only `temperature=` reproduces the reference's temperature-categorical
  (generation.py:51-54) / argmax-at-0 behavior.

`stream_generate` keeps the same compiled frame step but yields one 80 ms
audio chunk per frame through Mimi's incremental decoder, dispatching frame
k+1 before chunk k is synced to the host (dispatch-ahead).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Generator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.models.csm import CSM, ModelArgs, embed_audio, masked_input_embeds
from csm_mlx_tpu.models.llama import llama_forward
from csm_mlx_tpu.ops.attention import (NEG_INF, causal_mask_bias,
                                       key_validity_bias)
from csm_mlx_tpu.ops.kv_cache import KVCache
from csm_mlx_tpu.ops.layers import emb_table, linear
from csm_mlx_tpu.ops.rope import rope_cache_for
from csm_mlx_tpu.ops.sampling import (HISTORY_SIZE, SamplerConfig,
                                      apply_processors)

PROMPT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)
FRAME_MS = 80  # one RVQ frame = 80 ms (generation.py:106)
# Full unroll of the 30-step decoder inner loop: XLA software-pipelines the
# per-step weight streaming across the whole frame (measured RTF 10.6 vs 8.7
# at unroll=5 on TPU v5e; PERFORMANCE.md round 2). Override to trade compile
# time for decode speed.
def _decoder_scan_unroll() -> int:
    # Read at trace time (and folded into _resident_env_key) so
    # toggling it mid-process takes effect like the sibling knobs.
    return int(os.environ.get("CSM_TPU_DECODER_UNROLL", "31"))


def _dtype_name(dtype) -> str:
    return np.dtype(dtype).name if not isinstance(dtype, str) else dtype


def prompt_bucket(length: int) -> int:
    for b in PROMPT_BUCKETS:
        if length <= b:
            return b
    return length  # beyond the largest bucket: compile exactly for it


# ---------------------------------------------------------------------------
# Traced building blocks (called inside jit only)
# ---------------------------------------------------------------------------


def _prefill(
    params, args: ModelArgs, tokens, token_mask, pad_len, cache: KVCache, cos_b, sin_b
):
    """Full-prompt backbone forward; returns (last_hidden (B, D), cache)."""
    bcfg = args.backbone_config
    b, p, _ = tokens.shape
    embeds = masked_input_embeds(params, args, tokens, token_mask)
    pad_len = jnp.reshape(pad_len, (-1,))  # (B,)
    positions = jnp.arange(p, dtype=jnp.int32)[None, :] - pad_len[:, None]  # (B, P)
    cap = cache.capacity if cache is not None else p
    # Long prompts use the Pallas flash-prefill kernel (causal + left-pad
    # masking in-kernel, no (P, cap) logits in HBM); short ones stay on the
    # masked-einsum path where the mask tensors are trivial.
    use_flash = (
        jax.default_backend() == "tpu"
        and cache is not None
        and p >= 256 and p % 128 == 0
        and os.environ.get("CSM_TPU_FLASH_PREFILL", "1") == "1"
    )
    if use_flash:
        hidden, cache = llama_forward(
            params["backbone"], bcfg, embeds, cos_b, sin_b, positions,
            None, cache, flash_pad_len=pad_len,
        )
        return hidden[:, -1, :], cache
    # Keys span the whole cache capacity; causal over the first P slots,
    # everything beyond the prompt (unwritten) and left-pad slots masked.
    causal = causal_mask_bias(p, cap)
    key_valid = jnp.arange(cap, dtype=jnp.int32)[None, :] >= pad_len[:, None]
    mask_bias = jnp.maximum(
        causal[None, None] + key_validity_bias(key_valid)[:, None], NEG_INF
    )
    hidden, cache = llama_forward(
        params["backbone"], bcfg, embeds, cos_b, sin_b, positions, mask_bias, cache
    )
    return hidden[:, -1, :], cache


def _backbone_step(
    params, args: ModelArgs, tokens, token_mask, pad_len, cache: KVCache,
    cos_b, sin_b,
):
    """One-frame backbone decode step. tokens: (B, 1, 33).

    The per-step cost scales with cache.capacity (attention reads the whole
    static buffer); large-capacity dispatchers bucket the cache buffer
    itself (ops/attention.py::kv_prefix_buckets, continuous.py). `cache`
    may be a TieredKVCache (block decode): the mask then covers only the
    big tier's [pad, base) — recent-tier validity is applied inside
    tiered_sdpa.
    """
    from csm_mlx_tpu.ops.kv_cache import TieredKVCache

    bcfg = args.backbone_config
    capacity = cache.capacity
    embeds = masked_input_embeds(params, args, tokens, token_mask)
    positions = (cache.index - pad_len).reshape(-1, 1).astype(jnp.int32)
    k_idx = jnp.arange(capacity, dtype=jnp.int32)
    if isinstance(cache, TieredKVCache):
        key_valid = (k_idx[None] >= jnp.reshape(pad_len, (-1, 1))) & (
            k_idx[None] < cache.base
        )
    else:
        key_valid = (k_idx[None] >= jnp.reshape(pad_len, (-1, 1))) & (
            k_idx[None] <= cache.index
        )
    mask_bias = key_validity_bias(key_valid)[:, None]
    hidden, cache = llama_forward(
        params["backbone"], bcfg, embeds, cos_b, sin_b, positions, mask_bias,
        cache, decode_pad_len=jnp.reshape(pad_len, (-1,)),
    )
    return hidden[:, -1, :], cache


def _use_resident_decoder(params, sampler, b: int) -> int:
    """Trace-time gate for the VMEM-resident frame kernel: prepared tables
    present, simple sampler, not disabled, and a backend whose Pallas
    supports the kernel (TPU; CPU only via interpret mode in tests, which
    set CSM_TPU_RESIDENT_DECODER=interpret).

    Returns the number of kernel calls per frame: 0 = unusable (dispatched
    path), 1 = the whole batch in one call, n > 1 = the batch split into n
    chunks of <= CSM_TPU_RESIDENT_MAX_BATCH rows each. The default cap is
    64: the round-4 kernel variants freed ~5.5 MB of VMEM (rotation
    matrices -> cos/sin rows; int8 audio_head buffer), which fits a
    64-row call that round 2 could not (~+14% rows/ms over 48 at 50% vs
    37.5% MXU M-utilization; slots_ab 64-vs-48 measured 1.31x median on
    the full service). B in (48, 64] requires the VMEM-freeing round-4
    kernel variants; with CSM_TPU_RESIDENT_OPTS=classic (or a stale
    _resident snapshot) the effective cap auto-clamps to 48.
    Larger batches chunk, paying one extra ~106 MB weight load per chunk
    per frame -- still ~15x fewer decoder HBM bytes than the dispatched
    path's 31 re-streams. `CSM_TPU_RESIDENT_CHUNK=0` restores the
    round-2 behavior (dispatched past max batch)."""
    flag = os.environ.get("CSM_TPU_RESIDENT_DECODER", "1")
    max_b = int(os.environ.get("CSM_TPU_RESIDENT_MAX_BATCH", "64"))
    if flag == "0" or max_b <= 0 or "_resident" not in params:
        return 0
    from csm_mlx_tpu.ops.resident_decoder import effective_max_batch

    # A (48, 64] per-call batch only fits VMEM with the round-4 variants;
    # clamp to 48 when they're disabled (classic/explicit opts) or the
    # prepared tables predate them, instead of failing at Mosaic compile.
    max_b = effective_max_batch(params["_resident"], max_b)
    n_chunks = -(-b // max_b)
    if n_chunks > 1 and os.environ.get("CSM_TPU_RESIDENT_CHUNK", "1") == "0":
        return 0
    from csm_mlx_tpu.ops.resident_decoder import sampler_supported

    if not sampler_supported(sampler):
        return 0
    if jax.default_backend() == "cpu":
        # Interpret mode (tests) only; the TPU PRNG primitive behind the
        # temperature path has no CPU lowering, so greedy only.
        if flag != "interpret" or sampler.temperature != 0.0:
            return 0
    return n_chunks


def _decode_frame(
    params,
    args: ModelArgs,
    last_hidden,
    key,
    history,
    sampler: SamplerConfig,
    processors: Tuple,
    cos_d,
    sin_d,
):
    """Sample all 32 codebooks for one frame from the backbone hidden state.

    Reproduces generation.py:42-90: c0 from `codebook0_head` (with the
    logits-processor chain over c0 history), then a fresh 33-slot decoder
    cache primed with [backbone_hidden, c0_embed], then 30 more single-token
    decoder steps scoring against `audio_head[i-1]`.
    """
    from csm_mlx_tpu.ops.quant import audio_head_logits

    dcfg = args.decoder_config
    b = last_hidden.shape[0]
    n_cb = args.n_audio_codebooks
    audio_head = params["audio_head"]

    # --- codebook 0 ----------------------------------------------------
    c0_logits = linear(params["codebook0_head"], last_hidden).astype(jnp.float32)
    c0_logits = apply_processors(processors, history, c0_logits)
    key, k0 = jax.random.split(key)
    c0 = sampler(k0, c0_logits)
    history = jnp.roll(history, -1, axis=-1).at[:, -1].set(c0)

    # --- decoder prime: [h, embed(c0)] ----------------------------------
    c0_emb = embed_audio(params, args, 0, c0).astype(last_hidden.dtype)
    x01 = jnp.stack([last_hidden, c0_emb], axis=1)  # (B, 2, D_backbone)
    proj01 = linear(params["projection"], x01)

    # --- VMEM-resident whole-frame kernel (lockstep-batch fast path) ----
    # One pallas_call runs the prime + all 30 decoder steps with the int8
    # decoder weights loaded into VMEM once (ops/resident_decoder.py); the
    # dispatched path below re-streams all weights on every step. Batches
    # past the per-call VMEM ceiling split into equal chunks of their own
    # kernel calls (one extra weight load each — still far cheaper than 31
    # re-streams).
    n_chunks = _use_resident_decoder(params, sampler, b)
    if n_chunks:
        from csm_mlx_tpu.ops.resident_decoder import resident_decode_frame

        key, ks = jax.random.split(key)
        seeds = jax.random.randint(ks, (n_chunks,), 0,
                                   jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        proj01_t = proj01.transpose(1, 0, 2)  # (2, B, d_decoder)
        cs = -(-b // n_chunks)
        parts = []
        for ci in range(n_chunks):
            lo = ci * cs
            hi = min(b, lo + cs)
            parts.append(resident_decode_frame(
                params["_resident"], args, proj01_t[:, lo:hi, :],
                seeds[ci:ci + 1], sampler.temperature))  # (n_cb, hi-lo)
        toks = parts[0] if n_chunks == 1 else jnp.concatenate(parts, axis=1)
        frame = jnp.concatenate([c0[:, None], toks[1:].transpose(1, 0)],
                                axis=1).astype(jnp.int32)
        return frame, key, history

    # Decoder codebooks 1..31 sample with PLAIN temperature-categorical —
    # the reference's decoder-step semantics (generation.py:81-84); the
    # sampler's top-k/top-p/min-p chain applies to c0 only (above), same
    # as the resident kernel. Custom callables keep full control.
    dec_sampler = (SamplerConfig(temperature=sampler.temperature)
                   if type(sampler) is SamplerConfig else sampler)

    dcache = KVCache.init(dcfg, b, n_cb + 1, dtype=last_hidden.dtype)
    cap = n_cb + 1

    def dec_bias(q_len, index):
        causal = causal_mask_bias(q_len, cap, q_offset=index)
        return causal[None, None]

    hidden01, dcache = llama_forward(
        params["decoder"], dcfg, proj01, cos_d, sin_d,
        jnp.arange(2, dtype=jnp.int32)[None], dec_bias(2, 0), dcache,
    )
    key, k1 = jax.random.split(key)
    c1_logits = audio_head_logits(audio_head, 0, hidden01[:, -1],
                                  args.n_audio_vocab)
    c1 = dec_sampler(k1, c1_logits)

    # --- codebooks 2..31: lax.scan over single-token decoder steps ------
    def body(carry, i):
        dcache, key, prev = carry
        emb = emb_table(params["audio_embeddings"])[
            prev + (i - 1) * args.n_audio_vocab
        ].astype(last_hidden.dtype)
        x = linear(params["projection"], emb[:, None, :])
        positions = dcache.index.reshape(1, 1)
        hidden, dcache = llama_forward(
            params["decoder"], dcfg, x, cos_d, sin_d, positions,
            dec_bias(1, dcache.index), dcache,
        )
        logits = audio_head_logits(audio_head, i - 1, hidden[:, 0],
                                   args.n_audio_vocab)
        key, kk = jax.random.split(key)
        ci = dec_sampler(kk, logits)
        return (dcache, key, ci), ci

    # Unrolling lets XLA software-pipeline the per-step weight streaming
    # (the loop is HBM-bound; each step re-reads the decoder weights).
    (dcache, key, _), rest = jax.lax.scan(
        body, (dcache, key, c1), jnp.arange(2, n_cb, dtype=jnp.int32),
        unroll=_decoder_scan_unroll(),
    )
    frame = jnp.concatenate(
        [c0[:, None], c1[:, None], rest.transpose(1, 0)], axis=1
    ).astype(jnp.int32)  # (B, 32)
    return frame, key, history


def _frame_to_next_input(frame):
    """Feed a sampled frame back as the next (B,1,33) input + mask
    (generation.py:156-161): audio slots = frame, text slot = 0/unmasked."""
    b = frame.shape[0]
    zeros = jnp.zeros((b, 1), dtype=frame.dtype)
    tokens = jnp.concatenate([frame, zeros], axis=1)[:, None, :]
    mask = jnp.concatenate(
        [jnp.ones_like(frame), zeros], axis=1
    )[:, None, :].astype(jnp.int32)
    return tokens, mask


# ---------------------------------------------------------------------------
# Compiled entry points (cached per static configuration)
# ---------------------------------------------------------------------------


def _resident_env_key() -> Tuple[str, ...]:
    """The env knobs the builders read at trace time. Folding them into the
    builder cache keys makes toggling them mid-process take effect on the
    next call instead of silently reusing the old compiled loop."""
    return (os.environ.get("CSM_TPU_RESIDENT_DECODER", "1"),
            os.environ.get("CSM_TPU_RESIDENT_MAX_BATCH", "64"),
            os.environ.get("CSM_TPU_RESIDENT_CHUNK", "1"),
            os.environ.get("CSM_TPU_FLASH_PREFILL", "1"),
            os.environ.get("CSM_TPU_QUANT_PALLAS", "1"),
            os.environ.get("CSM_TPU_DECODER_UNROLL", "31"),
            os.environ.get("CSM_TPU_TIERED_KV", "1"),
            os.environ.get("CSM_TPU_GEN_BLOCK", "8"),
            os.environ.get("CSM_TPU_RESIDENT_OPTS", ""))


def _env_keyed(cached_builder):
    """Wrap an lru_cached builder so the resident env key is part of the
    cache key; preserves .cache_clear() for tests/benchmarks."""

    @functools.wraps(cached_builder)
    def wrapper(*a, **kw):
        return cached_builder(*a, _env=_resident_env_key(), **kw)

    wrapper.cache_clear = cached_builder.cache_clear
    return wrapper


@functools.lru_cache(maxsize=64)
def _build_generate_tokens_impl(
    args: ModelArgs,
    sampler: SamplerConfig,
    processors: Tuple,
    bucket: int,
    max_frames: int,
    cache_dtype: str,
    _env: Tuple[str, ...] = None,
):
    bcfg = args.backbone_config
    dcfg = args.decoder_config

    # Tiered block decode: the while_loop advances CSM_TPU_GEN_BLOCK frames
    # per iteration through an inner scan that carries only the recent KV
    # tier, keeping the big cache buffers loop-invariant per block so XLA
    # pipelines their reads (ops/kv_cache.py::TieredKVCache — a plain
    # per-frame cache carry collapses the attention read rate 553 -> 214
    # GB/s at B=48, benchmarks/micro_kv_carry.py). Emitted tokens are
    # unchanged (same valid-logit set; up to BLOCK-1 discarded frames
    # compute after the last row's EOS instead of stopping exactly on it).
    from csm_mlx_tpu.ops.kv_cache import TieredKVCache, use_tiered_kv

    block = max(1, int(os.environ.get("CSM_TPU_GEN_BLOCK", "8")))
    tiered = use_tiered_kv(block) and max_frames >= block
    pad_frames = -(-max_frames // block) * block if tiered else max_frames

    # The final (partial) block still writes K positions: size the cache
    # for the padded frame count so the last merge stays in bounds.
    capacity = bucket + pad_frames
    cos_b, sin_b = rope_cache_for(bcfg, max(capacity, bcfg.max_position_embeddings))
    cos_d, sin_d = rope_cache_for(dcfg, args.n_audio_codebooks + 1)
    dtype = jnp.dtype(cache_dtype)

    def gen(params, tokens, token_mask, pad_len, key):
        b = tokens.shape[0]
        # The scan-carry read penalty tiering removes scales with B (it is
        # KV bytes); at B=1 the block machinery's own overhead outweighs
        # it (bench.py measured ~-2% single-stream), so small batches keep
        # the exact per-frame loop.
        use_tiered = tiered and b >= int(os.environ.get(
            "CSM_TPU_TIERED_MIN_B", "2"))
        cache = KVCache.init(bcfg, b, capacity, dtype=dtype)
        last_hidden, cache = _prefill(
            params, args, tokens, token_mask, pad_len, cache, cos_b, sin_b
        )
        history = jnp.full((b, HISTORY_SIZE), -1, dtype=jnp.int32)
        frames = jnp.zeros((pad_frames, b, args.n_audio_codebooks), dtype=jnp.int32)

        state = dict(
            i=jnp.zeros((), jnp.int32),
            n_frames=jnp.zeros((b,), jnp.int32),
            done=jnp.zeros((b,), jnp.bool_),
            frames=frames,
            last_hidden=last_hidden,
            cache=cache,
            key=key,
            history=history,
        )

        def cond(st):
            return jnp.any(~st["done"]) & (st["i"] < max_frames)

        def body(st):
            frame, key, history = _decode_frame(
                params, args, st["last_hidden"], st["key"], st["history"],
                sampler, processors, cos_d, sin_d,
            )
            # Per-row EOS: an all-zero frame ends that row
            # (generation.py:151-152; rows are independent for batch TTS).
            row_eos = jnp.all(frame == 0, axis=1)  # (B,)
            done = st["done"] | row_eos
            frames = jax.lax.dynamic_update_slice(
                st["frames"], frame[None], (st["i"], 0, 0)
            )
            new_i = st["i"] + 1
            n_frames = jnp.where(done, st["n_frames"], new_i)
            do_next = jnp.any(~done) & (new_i < max_frames)

            def step(_):
                nxt_tokens, nxt_mask = _frame_to_next_input(frame)
                return _backbone_step(
                    params, args, nxt_tokens, nxt_mask, pad_len, st["cache"],
                    cos_b, sin_b,
                )

            def skip(_):
                return st["last_hidden"], st["cache"]

            last_hidden, cache = jax.lax.cond(do_next, step, skip, None)
            return dict(
                i=new_i, n_frames=n_frames, done=done, frames=frames,
                last_hidden=last_hidden, cache=cache, key=key, history=history,
            )

        def block_body(st):
            t0 = TieredKVCache.wrap(st["cache"], block)

            def inner(carry, _):
                last_hidden, rk, rv, idx, key, history, done, n_frames, j = \
                    carry
                frame, key, history = _decode_frame(
                    params, args, last_hidden, key, history,
                    sampler, processors, cos_d, sin_d,
                )
                row_eos = jnp.all(frame == 0, axis=1)
                done = done | row_eos
                n_frames = jnp.where(done, n_frames, j + 1)
                nxt_tokens, nxt_mask = _frame_to_next_input(frame)
                t = dataclasses.replace(t0, rk=rk, rv=rv, index=idx)
                last_hidden, t = _backbone_step(
                    params, args, nxt_tokens, nxt_mask, pad_len, t,
                    cos_b, sin_b,
                )
                return (last_hidden, t.rk, t.rv, t.index, key, history,
                        done, n_frames, j + 1), frame

            carry = (st["last_hidden"], t0.rk, t0.rv, t0.index, st["key"],
                     st["history"], st["done"], st["n_frames"], st["i"])
            carry, frames_blk = jax.lax.scan(inner, carry, None,
                                             length=block)
            (last_hidden, rk, rv, idx, key, history, done, n_frames,
             _j) = carry
            cache = dataclasses.replace(t0, rk=rk, rv=rv, index=idx).merge()
            frames = jax.lax.dynamic_update_slice(
                st["frames"], frames_blk, (st["i"], 0, 0))
            return dict(
                i=st["i"] + block, n_frames=n_frames, done=done,
                frames=frames, last_hidden=last_hidden, cache=cache,
                key=key, history=history,
            )

        final = jax.lax.while_loop(cond, block_body if use_tiered else body,
                                   state)
        n_frames = jnp.minimum(final["n_frames"], max_frames)
        return final["frames"][:max_frames], n_frames

    return jax.jit(gen)


_build_generate_tokens = _env_keyed(_build_generate_tokens_impl)


@functools.lru_cache(maxsize=64)
def _build_stream_fns_impl(
    args: ModelArgs,
    sampler: SamplerConfig,
    processors: Tuple,
    bucket: int,
    max_frames: int,
    cache_dtype: str,
    mimi_cfg,
    _env: Tuple[str, ...] = None,
):
    """(first_frame_fn, next_frame_fn) for streaming generation.

    `mimi_cfg` (a hashable MimiConfig) is required: each function ALSO runs
    the Mimi incremental decode of its frame inside the same jitted program
    and returns the 1,920-sample audio chunk — one host→device dispatch per
    frame instead of two. Through the remote-TPU tunnel each dispatch costs
    ~10–25 ms of latency, so fusing the codec step directly improves
    first-chunk latency and per-frame jitter."""
    bcfg = args.backbone_config
    dcfg = args.decoder_config
    capacity = bucket + max_frames
    cos_b, sin_b = rope_cache_for(bcfg, max(capacity, bcfg.max_position_embeddings))
    cos_d, sin_d = rope_cache_for(dcfg, args.n_audio_codebooks + 1)
    dtype = jnp.dtype(cache_dtype)

    def _codec_step(mimi_params, frame, dec_state):
        from csm_mlx_tpu.models.mimi.mimi import mimi_decode_step_fn

        codes = frame[..., None].astype(jnp.int32)  # (B, K, 1)
        chunk, dec_state = mimi_decode_step_fn(
            mimi_params, mimi_cfg, codes, dec_state)
        return chunk[:, 0, :], dec_state  # (B, frame_size)

    def first(params, tokens, token_mask, pad_len, key,
              mimi_params, dec_state):
        b = tokens.shape[0]
        cache = KVCache.init(bcfg, b, capacity, dtype=dtype)
        last_hidden, cache = _prefill(
            params, args, tokens, token_mask, pad_len, cache, cos_b, sin_b
        )
        history = jnp.full((b, HISTORY_SIZE), -1, dtype=jnp.int32)
        frame, key, history = _decode_frame(
            params, args, last_hidden, key, history, sampler, processors,
            cos_d, sin_d,
        )
        chunk, dec_state = _codec_step(mimi_params, frame, dec_state)
        return frame, chunk, dec_state, cache, key, history

    def step(params, frame, pad_len, cache, key, history,
             mimi_params, dec_state):
        tokens, mask = _frame_to_next_input(frame)
        last_hidden, cache = _backbone_step(
            params, args, tokens, mask, pad_len, cache, cos_b, sin_b
        )
        frame, key, history = _decode_frame(
            params, args, last_hidden, key, history, sampler, processors,
            cos_d, sin_d,
        )
        chunk, dec_state = _codec_step(mimi_params, frame, dec_state)
        return frame, chunk, dec_state, cache, key, history

    return (
        jax.jit(first, donate_argnums=(6,)),
        jax.jit(step, donate_argnums=(3, 5, 7)),
    )


_build_stream_fns = _env_keyed(_build_stream_fns_impl)


# ---------------------------------------------------------------------------
# Prompt assembly helpers (host side)
# ---------------------------------------------------------------------------


def _assemble_prompt(model: CSM, text: str, speaker: int, context: Sequence) -> tuple:
    from csm_mlx_tpu.tokenizers import tokenize_segment, tokenize_text_segment

    tokens, masks = [], []
    for segment in context:
        t, m = tokenize_segment(segment, n_audio_codebooks=model.n_audio_codebooks)
        tokens.append(np.asarray(t))
        masks.append(np.asarray(m))
    t, m = tokenize_text_segment(text, speaker, model.n_audio_codebooks)
    tokens.append(np.asarray(t))
    masks.append(np.asarray(m))
    prompt = np.concatenate(tokens, axis=0).astype(np.int32)
    mask = np.concatenate(masks, axis=0).astype(np.int32)
    return prompt, mask


def _pad_prompt(prompt: np.ndarray, mask: np.ndarray) -> tuple:
    """Left-pad to the bucket size; returns (tokens(1,P,33), mask, pad_len)."""
    s = prompt.shape[0]
    bucket = prompt_bucket(s)
    pad = bucket - s
    tokens = np.zeros((1, bucket, prompt.shape[1]), dtype=np.int32)
    m = np.zeros((1, bucket, prompt.shape[1]), dtype=np.int32)
    tokens[0, pad:] = prompt
    m[0, pad:] = mask
    return tokens, m, np.asarray([pad], dtype=np.int32), bucket


def _check_context_window(args: ModelArgs, prompt_len: int, max_frames: int) -> None:
    context_window = args.backbone_config.max_position_embeddings or 2048
    max_seq_len = context_window - max_frames
    if prompt_len >= max_seq_len:
        raise ValueError(
            f"Inputs too long ({prompt_len}), must be below max_seq_len - "
            f"max_audio_frames: {max_seq_len}"
        )


def _resolve_sampler(
    temperature: float, sampler: Optional[Any]
) -> SamplerConfig:
    if sampler is None:
        return SamplerConfig(temperature=temperature)
    return sampler  # SamplerConfig, or a jittable callable (must be hashable)


def _place_inputs(mesh, tokens, mask, pad_len, key):
    """Shard generation inputs over the mesh's "data" axis (batch rows);
    params carry their own shardings (parallel.shard_model) and jit
    propagates both — XLA inserts the TP/DP collectives."""
    if mesh is None:
        return (jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(pad_len),
                key)
    from jax.sharding import NamedSharding, PartitionSpec as P

    # Shard rows over "data" only when they divide it; otherwise replicate
    # the batch (tensor parallelism over "model" still applies) — a single
    # prompt on a data>1 mesh must not fail device_put's divisibility check.
    b = np.shape(tokens)[0]
    data_size = dict(mesh.shape).get("data", 1)
    row = "data" if data_size > 1 and b % data_size == 0 else None
    dp = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
    return (
        jax.device_put(jnp.asarray(tokens), dp(row, None, None)),
        jax.device_put(jnp.asarray(mask), dp(row, None, None)),
        jax.device_put(jnp.asarray(pad_len), dp(row)),
        jax.device_put(key, dp()),
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class FrameState(tuple):
    """(frame, cache, key, history) returned by stateful `generate_frame`."""

    __slots__ = ()

    frame = property(lambda self: self[0])
    cache = property(lambda self: self[1])
    key = property(lambda self: self[2])
    history = property(lambda self: self[3])


def generate_frame(
    model: CSM,
    tokens: jax.Array,
    *,
    temperature: float = 0.8,
    token_mask: Optional[jax.Array] = None,
    sampler: Optional[Any] = None,
    logits_processors: Optional[Sequence] = None,
    cache: Optional[KVCache] = None,
    pad_len: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    history: Optional[jax.Array] = None,
    return_state: bool = False,
) -> jax.Array:
    """Generate one 32-codebook frame (API parity with generation.py:21-92).

    This is the un-fused convenience path (one jit per call shape); `generate`
    / `stream_generate` use the fully fused compiled loop instead.

    Unlike the reference (whose mlx KVCache mutates in place), JAX arrays are
    immutable: the advanced cache/key/history must be *returned*, so a frame
    loop must pass `return_state=True` and thread the returned `FrameState`
    into the next call. Passing `cache`/`key`/`history` without
    `return_state=True` raises — silently reusing a stale cache would
    generate wrong audio with no error.
    """
    if (cache is not None or key is not None or history is not None) \
            and not return_state:
        raise ValueError(
            "generate_frame received cache/key/history but return_state is "
            "False; the advanced state would be silently discarded. Pass "
            "return_state=True and thread the returned (frame, cache, key, "
            "history) into the next call."
        )
    args = model.args
    smp = _resolve_sampler(temperature, sampler)
    processors = tuple(logits_processors or ())
    if token_mask is None:
        token_mask = jnp.ones_like(tokens)
    if key is None:
        key = jax.random.PRNGKey(0)
    if history is None:
        history = jnp.full((tokens.shape[0], HISTORY_SIZE), -1, dtype=jnp.int32)
    bcfg = args.backbone_config
    s = tokens.shape[1]
    if cache is None:
        # Full-window capacity: the documented frame-loop idiom threads the
        # returned state back in, so the cache must hold decode steps past
        # the prompt (a capacity of exactly `s` would make update_layer's
        # dynamic_update_slice clamp and silently overwrite the last
        # prompt slot on every subsequent frame).
        capacity = max(bcfg.max_position_embeddings or 2048, s)
        cache = KVCache.init(bcfg, tokens.shape[0], capacity,
                             dtype=model.dtype)
    if pad_len is None:
        pad_len = jnp.zeros((tokens.shape[0],), dtype=jnp.int32)

    cos_b, sin_b = rope_cache_for(bcfg, cache.capacity + 1)
    cos_d, sin_d = rope_cache_for(args.decoder_config, args.n_audio_codebooks + 1)

    if s > 1:
        last_hidden, cache = _prefill(
            model.params, args, tokens, token_mask, pad_len, cache, cos_b, sin_b
        )
    else:
        last_hidden, cache = _backbone_step(
            model.params, args, tokens, token_mask, pad_len, cache, cos_b, sin_b
        )
    frame, key, history = _decode_frame(
        model.params, args, last_hidden, key, history, smp, processors, cos_d, sin_d
    )
    if return_state:
        return FrameState((frame, cache, key, history))
    return frame


def generate_tokens(
    model: CSM,
    prompt: np.ndarray,
    prompt_mask: np.ndarray,
    max_audio_frames: int,
    *,
    temperature: float = 0.8,
    sampler: Optional[Any] = None,
    logits_processors: Optional[Sequence] = None,
    key: Optional[jax.Array] = None,
    mesh: Optional[Any] = None,
) -> Tuple[np.ndarray, int]:
    """Run the fused generation loop; returns (frames (F, 32) int32, F).

    Pass `mesh=` (after `parallel.shard_model(model, mesh)`) to run
    tensor-parallel over the mesh's "model" axis.
    """
    args = model.args
    _check_context_window(args, prompt.shape[0], max_audio_frames)
    smp = _resolve_sampler(temperature, sampler)
    processors = tuple(logits_processors or ())
    tokens, mask, pad_len, bucket = _pad_prompt(prompt, prompt_mask)
    fn = _build_generate_tokens(
        args, smp, processors, bucket, max_audio_frames, _dtype_name(model.dtype)
    )
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    from csm_mlx_tpu.ops.act_sharding import sharding_ctx

    with sharding_ctx(mesh):
        frames, n = jax.device_get(
            fn(model.params, *_place_inputs(mesh, tokens, mask, pad_len, key))
        )
    n = int(n[0])
    return frames[:n, 0, :], n


def generate_tokens_batch(
    model: CSM,
    prompts: Sequence[np.ndarray],
    prompt_masks: Sequence[np.ndarray],
    max_audio_frames: int,
    *,
    temperature: float = 0.8,
    sampler: Optional[Any] = None,
    logits_processors: Optional[Sequence] = None,
    key: Optional[jax.Array] = None,
    mesh: Optional[Any] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-parallel generation (new TPU capability; the reference is B=1).

    Prompts are left-padded to a common bucket; each row stops at its own
    all-zero EOS frame. Returns (frames (max_frames, B, 32), n_frames (B,)).

    With `mesh=` (after `parallel.shard_model(model, mesh)`), rows shard
    over the "data" axis and weights over "model" (tensor parallelism).
    A batch that does not divide the "data" axis is REPLICATED across it
    instead (tensor parallelism still applies) — correctness is preserved
    but data parallelism is lost; pad the batch to a multiple of the data
    axis (as `serve.TTSServer` does) to keep it.
    """
    args = model.args
    smp = _resolve_sampler(temperature, sampler)
    processors = tuple(logits_processors or ())
    b = len(prompts)
    longest = max(p.shape[0] for p in prompts)
    _check_context_window(args, longest, max_audio_frames)
    bucket = prompt_bucket(longest)
    n_slots = prompts[0].shape[1]
    tokens = np.zeros((b, bucket, n_slots), dtype=np.int32)
    mask = np.zeros((b, bucket, n_slots), dtype=np.int32)
    pad_len = np.zeros((b,), dtype=np.int32)
    for i, (p, m) in enumerate(zip(prompts, prompt_masks)):
        pad = bucket - p.shape[0]
        tokens[i, pad:] = p
        mask[i, pad:] = m
        pad_len[i] = pad
    fn = _build_generate_tokens(
        args, smp, processors, bucket, max_audio_frames, _dtype_name(model.dtype)
    )
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    from csm_mlx_tpu.ops.act_sharding import sharding_ctx

    with sharding_ctx(mesh):
        frames, n = jax.device_get(
            fn(model.params, *_place_inputs(mesh, tokens, mask, pad_len, key))
        )
    return frames, n


def generate_batch(
    model: CSM,
    texts: Sequence[str],
    speakers: Sequence[int],
    contexts: Optional[Sequence[Sequence]] = None,
    max_audio_length_ms: float = 90_000,
    watermark_key: Optional[int] = None,
    **kwargs,
) -> List[jax.Array]:
    """Batched TTS: one waveform per (text, speaker[, context]) row."""
    from csm_mlx_tpu.tokenizers import decode_audio

    contexts = contexts or [()] * len(texts)
    if not (len(texts) == len(speakers) == len(contexts)):
        # zip would silently truncate, then the per-row slicing below would
        # fail with an obscure IndexError (or drop rows without any error).
        raise ValueError(
            f"texts/speakers/contexts lengths differ: {len(texts)}/"
            f"{len(speakers)}/{len(contexts)}")
    max_frames = int(max_audio_length_ms / FRAME_MS)
    prompts, masks = [], []
    for text, speaker, context in zip(texts, speakers, contexts):
        p, m = _assemble_prompt(model, text, speaker, context)
        prompts.append(p)
        masks.append(m)
    frames, n = generate_tokens_batch(model, prompts, masks, max_frames,
                                      **kwargs)
    # One batched Mimi decode over the longest row; slice per row.
    f_max = int(n.max()) if len(n) else 0
    if f_max == 0:
        return [jnp.zeros((0,), dtype=jnp.float32) for _ in texts]
    codes = jnp.asarray(frames[:f_max].transpose(1, 2, 0), dtype=jnp.int32)
    audio = decode_audio(codes, n_audio_codebooks=model.n_audio_codebooks)
    frame_size = audio.shape[-1] // f_max
    rows = [audio[i, 0, : int(n[i]) * frame_size] for i in range(len(texts))]
    if watermark_key is not None:
        from csm_mlx_tpu.watermark import embed_watermark

        rows = [embed_watermark(r, watermark_key) for r in rows]
    return rows


def generate(
    model: CSM,
    text: str,
    speaker: int,
    context: Sequence = (),
    max_audio_length_ms: float = 90_000,
    *,
    temperature: float = 0.8,
    sampler: Optional[Any] = None,
    logits_processors: Optional[Sequence] = None,
    key: Optional[jax.Array] = None,
    mesh: Optional[Any] = None,
    watermark_key: Optional[int] = None,
) -> jax.Array:
    """Text (+ conversational context) -> 24 kHz waveform (generation.py:95-178).

    `watermark_key` embeds a keyed spread-spectrum watermark in the output
    (the reference's TODO at generation.py:176; see `csm_mlx_tpu.watermark`).
    """
    from csm_mlx_tpu.tokenizers import decode_audio

    max_frames = int(max_audio_length_ms / FRAME_MS)
    prompt, mask = _assemble_prompt(model, text, speaker, context)
    frames, n = generate_tokens(
        model, prompt, mask, max_frames,
        temperature=temperature, sampler=sampler,
        logits_processors=logits_processors, key=key, mesh=mesh,
    )
    if n == 0:
        print("[WARN] No samples generated.")
        return jnp.zeros((0,), dtype=jnp.float32)
    # (F, 32) -> (1, K, F) for Mimi decode.
    codes = jnp.asarray(frames.T[None], dtype=jnp.int32)
    audio = decode_audio(codes, n_audio_codebooks=model.n_audio_codebooks)
    audio = audio[0, 0]
    if watermark_key is not None:
        from csm_mlx_tpu.watermark import embed_watermark

        audio = embed_watermark(audio, watermark_key)
    return audio


def generate_long(
    model: CSM,
    text: str,
    speaker: int,
    context: Sequence = (),
    *,
    max_segment_audio_ms: float = 30_000,
    rolling_context: int = 6,
    temperature: float = 0.8,
    sampler: Optional[Any] = None,
    key: Optional[jax.Array] = None,
    watermark_key: Optional[int] = None,
    pause_ms: float = 0.0,
) -> jax.Array:
    """Long-form synthesis past the model's context window.

    `generate` (like the reference, generation.py:131-137) refuses prompts
    near `max_position_embeddings`, capping one call at ~2 minutes of
    conversation. This splits `text` into sentences, synthesizes each with a
    rolling window of the last `rolling_context` generated segments as
    conversational context — the voice-continuity recipe the streaming demo
    uses (run_streaming_csm_mlx.py:1060-1073) — and concatenates. Arbitrary
    text length; voice identity carries through the rolling context.

    `pause_ms` inserts silence between sentences. Watermarking is applied
    once over the stitched waveform (whole-utterance STFT framing).
    """
    from csm_mlx_tpu import tokenizers as tok_mod
    from csm_mlx_tpu.apps.voice_chat import split_sentences
    from csm_mlx_tpu.segment import SAMPLING_RATE, Segment

    sentences = split_sentences(text) or ([text.strip()] if text.strip() else [])
    if key is None:
        # Same default as generate(): fresh randomness per run.
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    ctx = list(context)
    pieces = []

    # Exact per-segment prompt length (text tokens + Mimi frames + EOS
    # frame, mirroring tokenize_segment) so the rolling context can be
    # trimmed by TOKEN budget, not just segment count — long sentences
    # would otherwise overflow the backbone window mid-synthesis and raise
    # the very error generate_long exists to avoid.
    txt_tok = tok_mod.get_text_tokenizer()
    frame_size = int(SAMPLING_RATE * FRAME_MS / 1000)

    def seg_len(seg: Segment) -> int:
        text_tokens = len(txt_tok.encode(f"[{seg.speaker}]{seg.text}"))
        frames = -(-int(np.asarray(seg.audio).shape[-1]) // frame_size)
        return text_tokens + frames + 1

    max_seg_frames = int(max_segment_audio_ms / FRAME_MS)
    ctx_cfg = model.args.backbone_config.max_position_embeddings or 2048
    budget = ctx_cfg - max_seg_frames
    if budget <= 1:
        # Without this, fit_sentence/hard_split degenerate to exploding the
        # text into single characters (their >=1-char termination floor)
        # before generate() fails with a baffling "must be below <negative>".
        raise ValueError(
            f"max_segment_audio_ms={max_segment_audio_ms} "
            f"({max_seg_frames} frames) does not fit the backbone context "
            f"window ({ctx_cfg} positions) with room for any text; use a "
            f"smaller segment budget")

    def fit_sentence(sentence: str) -> List[str]:
        """Split a single sentence that alone exceeds the token budget
        (unpunctuated wall-of-text input) into word chunks that fit —
        otherwise generate() would raise the context-window error this
        function exists to avoid."""
        if len(txt_tok.encode(f"[{speaker}]{sentence}")) < budget:
            return [sentence]

        def hard_split(word: str) -> List[str]:
            # Character-level fallback for a single space-less "word" that
            # alone exceeds the budget (CJK prose — the sentence splitter
            # only knows ASCII enders — or a long URL). Bisect for the
            # largest prefix that fits; always take >= 1 char so a
            # pathological budget still terminates.
            out: List[str] = []
            lo = 0
            while lo < len(word):
                best, lo_b, hi_b = lo + 1, lo + 1, len(word)
                while lo_b <= hi_b:
                    mid = (lo_b + hi_b) // 2
                    if len(txt_tok.encode(
                            f"[{speaker}]{word[lo:mid]}")) < budget:
                        best, lo_b = mid, mid + 1
                    else:
                        hi_b = mid - 1
                out.append(word[lo:best])
                lo = best
            return out

        parts: List[str] = []
        cur: List[str] = []

        def flush():
            if cur:
                parts.append(" ".join(cur))
                cur.clear()

        for w in sentence.split() or [sentence]:
            if len(txt_tok.encode(f"[{speaker}]{w}")) >= budget:
                flush()
                parts.extend(hard_split(w))
                continue
            cand = " ".join(cur + [w])
            if cur and len(txt_tok.encode(f"[{speaker}]{cand}")) >= budget:
                flush()
            cur.append(w)
        flush()
        return parts

    sentences = [p for s in sentences for p in fit_sentence(s)]
    ctx_lens = [seg_len(s) for s in ctx]  # computed once per segment

    gap = (np.zeros((int(pause_ms * SAMPLING_RATE / 1000),), np.float32)
           if pause_ms > 0 else None)
    for sentence in sentences:
        sent_tokens = len(txt_tok.encode(f"[{speaker}]{sentence}"))
        while ctx and sum(ctx_lens) + sent_tokens >= budget:
            ctx.pop(0)  # drop the oldest voice-context segment
            ctx_lens.pop(0)
        key, sub = jax.random.split(key)
        audio = generate(
            model, sentence, speaker, tuple(ctx),
            max_audio_length_ms=max_segment_audio_ms,
            temperature=temperature, sampler=sampler, key=sub,
        )
        if audio.shape[0] == 0:
            continue
        host_audio = np.asarray(audio, np.float32)
        if gap is not None and pieces:
            pieces.append(gap)  # between pieces only — never a silent tail
        pieces.append(host_audio)
        if rolling_context > 0:
            seg = Segment(speaker, sentence, host_audio)
            ctx.append(seg)
            ctx_lens.append(seg_len(seg))
            ctx = ctx[-rolling_context:]
            ctx_lens = ctx_lens[-rolling_context:]
        else:
            ctx, ctx_lens = [], []  # rolling_context=0: independent
    if not pieces:
        return jnp.zeros((0,), dtype=jnp.float32)
    out = jnp.asarray(np.concatenate(pieces))
    if watermark_key is not None:
        from csm_mlx_tpu.watermark import embed_watermark

        out = embed_watermark(out, watermark_key)
    return out


def stream_generate(
    model: CSM,
    text: str,
    speaker: int,
    context: Sequence = (),
    max_audio_length_ms: float = 90_000,
    *,
    temperature: float = 0.8,
    sampler: Optional[Any] = None,
    logits_processors: Optional[Sequence] = None,
    key: Optional[jax.Array] = None,
) -> Generator[jax.Array, None, None]:
    """Yield one 1,920-sample (80 ms @ 24 kHz) chunk per generated frame
    (generation.py:181-258), overlapping device compute with host yields."""
    from csm_mlx_tpu.tokenizers import get_audio_tokenizer

    args = model.args
    max_frames = int(max_audio_length_ms / FRAME_MS)
    prompt, prompt_mask = _assemble_prompt(model, text, speaker, context)
    _check_context_window(args, prompt.shape[0], max_frames)
    smp = _resolve_sampler(temperature, sampler)
    processors = tuple(logits_processors or ())
    tokens, mask, pad_len, bucket = _pad_prompt(prompt, prompt_mask)
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

    # positional call: functools.cache keys positional vs keyword calls
    # differently, and tokenize_audio/decode_audio call positionally — a
    # keyword call here would build a SECOND full Mimi instance
    codec = get_audio_tokenizer(model.n_audio_codebooks)
    dec_state = codec.init_decode_state()

    # Fused step functions: frame generation AND the Mimi incremental
    # decode run in one jitted program per frame — halves the per-frame
    # host dispatches (each costs ~10-25 ms through the remote-TPU tunnel).
    first_fn, step_fn = _build_stream_fns(
        args, smp, processors, bucket, max_frames, _dtype_name(model.dtype),
        codec.cfg,
    )
    frame, chunk, dec_state, cache, key, history = first_fn(
        model.params, jnp.asarray(tokens), jnp.asarray(mask),
        jnp.asarray(pad_len), key, codec.params, dec_state,
    )
    for i in range(max_frames):
        host_frame = np.asarray(frame)
        if not host_frame.any():
            break  # EOS (the already-decoded chunk for this frame is moot)
        # Dispatch the next frame (+ its codec step) before yielding.
        if i + 1 < max_frames:
            nxt = step_fn(
                model.params, frame, jnp.asarray(pad_len), cache, key,
                history, codec.params, dec_state,
            )
        else:
            nxt = None
        yield chunk[0]
        if nxt is None:
            break
        frame, chunk, dec_state, cache, key, history = nxt
