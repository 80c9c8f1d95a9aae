"""Independent numpy oracle for the CSM glue semantics.

This module is a from-scratch numpy transcription of the *reference*
implementation's CSM-specific behavior — NOT of this repo's code — so it can
serve as a cross-implementation check that the repo's `generate_frame` /
`generate_tokens` agree with the reference semantics over random weights:

- the fused audio embedding table with `token + codebook * n_audio_vocab`
  offsets and the 33-slot masked-sum input embed
  (/root/reference/csm_mlx/models.py:79-92, generation.py:34-36),
- torchtune-parity attention: interleaved-pair RoPE with Llama-3.1 frequency
  scaling built by a literal per-frequency loop
  (/root/reference/csm_mlx/attention.py:94-177), GQA via repeat
  (attention.py:242-245), softmax(QK^T*scale+mask)V,
- the mlx_lm Llama block (RMSNorm -> attn -> residual, RMSNorm -> SwiGLU ->
  residual, final RMSNorm; usage at /root/reference/csm_mlx/models.py:50-51),
- one-frame generation: backbone step -> codebook0_head -> greedy c0 ->
  31-step decoder loop with a FRESH per-frame KV cache, re-projecting each
  step's input and scoring codebook i against audio_head[i-1]
  (/root/reference/csm_mlx/generation.py:21-92),
- the frame loop: all-zero-frame EOS, frame fed back as a 1-step input with a
  zeroed text column and zeroed text mask
  (/root/reference/csm_mlx/generation.py:139-161).

Everything is plain float32 numpy — no jax, no code shared with csm_mlx_tpu.
The oracle consumes the same parameter pytree layout as the repo's
checkpoints (nested dicts of (out, in) Linear weights) because that layout
*is* the reference checkpoint layout.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# RoPE (reference attention.py:10-177)
# ---------------------------------------------------------------------------


def rope_cache(head_dim: int, base: float, max_seq_len: int,
               scale_factor: float, low_freq_factor: float,
               high_freq_factor: float, old_context_len: int,
               use_scaling: bool) -> np.ndarray:
    """[max_seq_len, head_dim//2, 2] (cos, sin) cache (attention.py:57-92).

    apply_scaling transcribed as the reference's literal per-frequency loop
    (attention.py:94-117) — intentionally not vectorized, so this stays an
    independent derivation from the repo's ops/rope.py.
    """
    freqs = 1.0 / (
        base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float32)
                 / head_dim)
    )
    if use_scaling:
        low_freq_wavelen = old_context_len / low_freq_factor
        high_freq_wavelen = old_context_len / high_freq_factor
        new_freqs = []
        for freq in freqs:
            wavelen = 2 * math.pi / freq
            if wavelen < high_freq_wavelen:
                new_freqs.append(freq)
            elif wavelen > low_freq_wavelen:
                new_freqs.append(freq / scale_factor)
            else:
                assert low_freq_wavelen != high_freq_wavelen
                smooth = (old_context_len / wavelen - low_freq_factor) / (
                    high_freq_factor - low_freq_factor
                )
                new_freqs.append(
                    (1 - smooth) * freq / scale_factor + smooth * freq
                )
        freqs = np.array(new_freqs, dtype=np.float32)
    seq_idx = np.arange(max_seq_len, dtype=np.float32)
    idx_theta = np.einsum("i,j->ij", seq_idx, freqs).astype(np.float32)
    return np.stack([np.cos(idx_theta), np.sin(idx_theta)], axis=-1)


def apply_rope(x: np.ndarray, cache: np.ndarray, offset: int) -> np.ndarray:
    """Interleaved-pair rotation (attention.py:148-177). x: (B,S,H,D)."""
    seq_len = x.shape[1]
    rc = cache[None, offset: offset + seq_len]  # (1, S, D/2, 2)
    xshaped = x.astype(np.float32).reshape(*x.shape[:-1], -1, 2)
    rc = rc.reshape(-1, xshaped.shape[1], 1, xshaped.shape[3], 2)
    x_out = np.stack(
        [
            xshaped[..., 0] * rc[..., 0] - xshaped[..., 1] * rc[..., 1],
            xshaped[..., 1] * rc[..., 0] + xshaped[..., 0] * rc[..., 1],
        ],
        axis=-1,
    )
    return x_out.reshape(x.shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Llama stack (mlx_lm block semantics + reference Attention, attention.py:180-253)
# ---------------------------------------------------------------------------


class OracleKVCache:
    """Growing KV cache (mlx_lm KVCache semantics: offset + concat)."""

    def __init__(self):
        self.k: Optional[np.ndarray] = None
        self.v: Optional[np.ndarray] = None

    @property
    def offset(self) -> int:
        return 0 if self.k is None else self.k.shape[2]

    def update_and_fetch(self, k, v):
        if self.k is None:
            self.k, self.v = k, v
        else:
            self.k = np.concatenate([self.k, k], axis=2)
            self.v = np.concatenate([self.v, v], axis=2)
        return self.k, self.v


def _lin(p: Dict, x: np.ndarray) -> np.ndarray:
    return x @ np.asarray(p["weight"], dtype=np.float32).T


def _rms_norm(p: Dict, x: np.ndarray, eps: float) -> np.ndarray:
    w = np.asarray(p["weight"], dtype=np.float32)
    return x * w / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps)


def _attention(p: Dict, cfg, x: np.ndarray, rope: np.ndarray,
               mask: Optional[np.ndarray], cache: OracleKVCache) -> np.ndarray:
    b, s, _ = x.shape
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    hd = cfg.head_dim
    q = _lin(p["q_proj"], x).reshape(b, s, n_heads, hd)
    k = _lin(p["k_proj"], x).reshape(b, s, n_kv, hd)
    v = _lin(p["v_proj"], x).reshape(b, s, n_kv, hd)

    q = apply_rope(q, rope, cache.offset)
    k = apply_rope(k, rope, cache.offset)

    q = q.swapaxes(1, 2)
    k = k.swapaxes(1, 2)
    v = v.swapaxes(1, 2).astype(np.float32)
    k, v = cache.update_and_fetch(k, v)

    if n_heads != n_kv:  # GQA via repeat (attention.py:242-245)
        q_per_kv = n_heads // n_kv
        k = np.repeat(k, q_per_kv, axis=1)
        v = np.repeat(v, q_per_kv, axis=1)

    scale = hd ** -0.5
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        scores = scores + mask
    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = np.exp(scores)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.swapaxes(1, 2).reshape(b, s, -1)
    return _lin(p["o_proj"], out)


def _causal_mask(s: int, offset: int) -> Optional[np.ndarray]:
    """Additive causal mask over (s, offset+s) keys (mlx_lm semantics)."""
    if s <= 1:
        return None
    q_pos = offset + np.arange(s)[:, None]
    k_pos = np.arange(offset + s)[None, :]
    return np.where(k_pos <= q_pos, 0.0, -1e9).astype(np.float32)


def llama_forward(params: Dict, cfg, embeds: np.ndarray, rope: np.ndarray,
                  cache: List[OracleKVCache]) -> np.ndarray:
    """mlx_lm LlamaModel forward over externally-computed embeddings."""
    x = embeds.astype(np.float32)
    s = x.shape[1]
    mask = _causal_mask(s, cache[0].offset)
    for lp, c in zip(params["layers"], cache):
        h = _rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        x = x + _attention(lp["self_attn"], cfg, h, rope, mask, c)
        h = _rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        gate = _lin(lp["mlp"]["gate_proj"], h)
        up = _lin(lp["mlp"]["up_proj"], h)
        silu = gate / (1.0 + np.exp(-gate))
        x = x + _lin(lp["mlp"]["down_proj"], silu * up)
    return _rms_norm(params["norm"], x, cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# CSM glue (models.py:79-92, generation.py:21-92, :139-161)
# ---------------------------------------------------------------------------


def embed_tokens(params: Dict, args, tokens: np.ndarray) -> np.ndarray:
    """(B, S, 33) -> (B, S, 33, D): audio slots offset into the fused table,
    text token last (models.py:82-92)."""
    text_w = np.asarray(params["text_embeddings"]["weight"], dtype=np.float32)
    audio_w = np.asarray(params["audio_embeddings"]["weight"], dtype=np.float32)
    text_embeds = text_w[tokens[:, :, -1]][:, :, None, :]
    audio_tokens = tokens[:, :, :-1] + (
        args.n_audio_vocab * np.arange(args.n_audio_codebooks)
    )
    audio_embeds = audio_w[audio_tokens.reshape(-1)].reshape(
        (*tokens.shape[:2], args.n_audio_codebooks, -1)
    )
    return np.concatenate([audio_embeds, text_embeds], axis=-2)


def embed_audio(params: Dict, args, codebook: int, tokens: np.ndarray
                ) -> np.ndarray:
    audio_w = np.asarray(params["audio_embeddings"]["weight"], dtype=np.float32)
    return audio_w[tokens + codebook * args.n_audio_vocab]


def _rope_for(cfg, max_seq: int) -> np.ndarray:
    sc = cfg.rope_scaling
    return rope_cache(
        cfg.head_dim, cfg.rope_theta, max_seq,
        scale_factor=sc.factor if sc else 1.0,
        low_freq_factor=sc.low_freq_factor if sc else 1.0,
        high_freq_factor=sc.high_freq_factor if sc else 4.0,
        old_context_len=sc.original_max_position_embeddings if sc else 8192,
        use_scaling=bool(sc and sc.rope_type == "llama3"),
    )


def generate_frame(params: Dict, args, tokens: np.ndarray,
                   token_mask: np.ndarray,
                   cache: List[OracleKVCache]) -> np.ndarray:
    """Greedy one-frame generation (generation.py:21-92). Returns (B, 32)."""
    bcfg = args.backbone_config
    dcfg = args.decoder_config
    rope_b = _rope_for(bcfg, bcfg.max_position_embeddings or 2048)
    rope_d = _rope_for(dcfg, args.n_audio_codebooks + 2)

    embeds = embed_tokens(params, args, tokens)
    embeds = embeds * token_mask[..., None].astype(np.float32)
    backbone_input = embeds.sum(-2)

    hidden = llama_forward(params["backbone"], bcfg, backbone_input, rope_b,
                           cache)
    last_hidden = hidden[:, -1, :]

    c0_logits = _lin(params["codebook0_head"], last_hidden)
    c0_sample = np.argmax(c0_logits, axis=-1)[:, None]  # greedy
    c0_embeds = embed_audio(params, args, 0, c0_sample)

    decoder_inputs = np.concatenate([last_hidden[:, None, :], c0_embeds],
                                    axis=1)
    frame = np.zeros((tokens.shape[0], args.n_audio_codebooks),
                     dtype=np.int32)
    frame[:, 0] = c0_sample[:, 0]

    audio_head = np.asarray(params["audio_head"], dtype=np.float32)
    decoder_cache = [OracleKVCache()
                     for _ in params["decoder"]["layers"]]
    for index in range(1, args.n_audio_codebooks):
        proj = _lin(params["projection"], decoder_inputs)
        decoder_hidden = llama_forward(params["decoder"], dcfg, proj, rope_d,
                                       decoder_cache)
        ci_logits = decoder_hidden[:, -1, :] @ audio_head[index - 1]
        ci_sample = np.argmax(ci_logits, axis=-1)[:, None]
        decoder_inputs = embed_audio(params, args, index, ci_sample)
        frame[:, index] = ci_sample[:, 0]
    return frame


def generate_tokens(params: Dict, args, prompt: np.ndarray,
                    prompt_mask: np.ndarray, max_audio_frames: int
                    ) -> np.ndarray:
    """Greedy frame loop for B=1 (generation.py:139-161). Returns (F, 32)."""
    cache = [OracleKVCache() for _ in params["backbone"]["layers"]]
    inp = prompt[None].astype(np.int64)
    mask = prompt_mask[None].astype(np.float32)
    samples = []
    for _ in range(max_audio_frames):
        frame = generate_frame(params, args, inp, mask, cache)
        if not frame.any():
            break  # all-zero frame = EOS (generation.py:151-152)
        samples.append(frame[0])
        # feed back: frame + zeroed text column, audio mask 1 / text mask 0
        inp = np.concatenate(
            [frame, np.zeros((1, 1), dtype=np.int32)], axis=1
        )[:, None, :].astype(np.int64)
        mask = np.concatenate(
            [np.ones_like(frame, dtype=np.float32),
             np.zeros((1, 1), dtype=np.float32)], axis=1
        )[:, None, :]
    return (np.stack(samples) if samples
            else np.zeros((0, args.n_audio_codebooks), dtype=np.int32))
