"""Tokenizer facade: Mimi audio codec + Llama-3 text tokenizer + frame assembly.

Capability parity with `/root/reference/csm_mlx/tokenizers.py`:
- cached singletons for the audio codec (Mimi, weights from
  `kyutai/moshiko-pytorch-bf16`, tokenizers.py:14-21) and the Llama-3.2-1B
  text tokenizer with the BOS/EOS TemplateProcessing post-processor
  (tokenizers.py:24-40);
- frame assembly: text tokens of "[{speaker}]{text}" go in column 32 of an
  (S, 33) int frame, audio tokens in columns 0-31, with parallel 0/1 masks
  (tokenizers.py:43-102); audio gets an appended all-zero EOS frame;
- the per-conversation loss-mask builder (tokenizers.py:105-145);
- `decode_audio` wrapping Mimi decode (tokenizers.py:148-150).

Host-side numpy for frame assembly (cheap), device compute only inside Mimi.
Weights resolve from (in order): explicit path argument, the
`CSM_TPU_MIMI_WEIGHTS` / `CSM_TPU_TEXT_TOKENIZER` env vars, the HF hub cache.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.config import TOKENIZERS
from csm_mlx_tpu.models.mimi import Mimi, mimi_202407
from csm_mlx_tpu.segment import Segment

N_SLOTS = 33  # 32 audio codebooks + 1 text column


_MIMI_CACHE: dict = {}  # n_codebooks -> (weights_path | None, Mimi)


def get_audio_tokenizer(
    n_audio_codebooks: int = 32, weights: Optional[str] = None
) -> Mimi:
    """Mimi codec singleton per codebook count. Random-init only when no
    weights are resolvable at all (unit tests / offline benchmarks); real
    use loads the kyutai checkpoint.

    An EXPLICIT path (the `weights` argument or CSM_TPU_MIMI_WEIGHTS) that
    does not exist raises — a typo'd path must fail loudly, not silently
    tokenize everything with a random codec. The cache is keyed on the
    codebook count only: a startup call with explicit weights installs the
    canonical instance that the no-argument `tokenize_audio`/`decode_audio`
    calls then share (two inconsistent codecs must never coexist)."""
    path = weights or os.environ.get("CSM_TPU_MIMI_WEIGHTS")
    if path is not None and not os.path.exists(path):
        raise FileNotFoundError(
            f"Mimi weights not found: {path!r} (from the weights argument "
            f"or CSM_TPU_MIMI_WEIGHTS); refusing to fall back to a "
            f"random-init codec")
    cached = _MIMI_CACHE.get(n_audio_codebooks)
    if cached is not None and (path is None or cached[0] == path):
        return cached[1]
    if path is None:
        try:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(**TOKENIZERS["audio"])
        except Exception:
            path = None
    mimi = Mimi(mimi_202407(n_audio_codebooks), dtype=jnp.float32)
    if path is not None and os.path.exists(path):
        mimi.load_pytorch_weights(path)
    _MIMI_CACHE[n_audio_codebooks] = (path, mimi)
    return mimi


get_audio_tokenizer.cache_clear = _MIMI_CACHE.clear  # drop-in for @cache


_TEXT_TOK_CACHE: dict = {}  # "tok" -> (source, tokenizer)


def get_text_tokenizer(path: Optional[str] = None):
    """Llama-3.2-1B tokenizer with single-sequence BOS/EOS template
    (tokenizers.py:24-40).

    Same canonical-singleton contract as `get_audio_tokenizer`: a startup
    call with an explicit `path` installs THE instance that later no-arg
    calls (`tokenize_text_segment` inside generate) share — a per-path
    cache would make the internal call re-resolve the default HF repo
    (offline crash, or a silently different tokenizer)."""
    from tokenizers.processors import TemplateProcessing
    from transformers import AutoTokenizer

    src = path or os.environ.get("CSM_TPU_TEXT_TOKENIZER") or TOKENIZERS["text"]["repo_id"]
    cached = _TEXT_TOK_CACHE.get("tok")
    if cached is not None and (path is None or cached[0] == src):
        return cached[1]
    tokenizer = AutoTokenizer.from_pretrained(src)
    bos = tokenizer.bos_token
    eos = tokenizer.eos_token
    tokenizer._tokenizer.post_processor = TemplateProcessing(
        single=f"{bos}:0 $A:0 {eos}:0",
        pair=f"{bos}:0 $A:0 {eos}:0 {bos}:1 $B:1 {eos}:1",
        special_tokens=[
            (f"{bos}", tokenizer.bos_token_id),
            (f"{eos}", tokenizer.eos_token_id),
        ],
    )
    _TEXT_TOK_CACHE["tok"] = (src, tokenizer)
    return tokenizer


get_text_tokenizer.cache_clear = _TEXT_TOK_CACHE.clear  # drop-in for @cache


def tokenize_text_segment(
    text: str, speaker: int, n_audio_codebooks: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """"[speaker]text" -> ((S, K+1) frame, mask), text in the last column."""
    n_slots = n_audio_codebooks + 1
    text_tokenizer = get_text_tokenizer()
    text_tokens = text_tokenizer.encode(f"[{speaker}]{text}")
    s = len(text_tokens)
    frame = np.zeros((s, n_slots), dtype=np.int32)
    mask = np.zeros((s, n_slots), dtype=np.int32)
    frame[:, -1] = np.asarray(text_tokens, dtype=np.int32)
    mask[:, -1] = 1
    return frame, mask


def tokenize_audio(
    audio, *, n_audio_codebooks: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """24 kHz mono audio -> ((F+1, 33) frames incl. all-zero EOS, mask)."""
    audio_tokenizer = get_audio_tokenizer(n_audio_codebooks)
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 0 or sum(d > 1 for d in audio.shape) > 1:
        # A blind reshape(-1) would interleave stereo channels into one
        # double-speed garbage waveform and encode it without any error.
        raise ValueError(
            f"tokenize_audio expects mono 1-D audio, got shape "
            f"{audio.shape}; downmix or select a channel first")
    audio = audio.reshape(1, 1, -1)
    codes = np.asarray(audio_tokenizer.encode(jnp.asarray(audio)))[0]  # (K, F)
    eos_frame = np.zeros((codes.shape[0], 1), dtype=codes.dtype)
    codes = np.concatenate([codes, eos_frame], axis=1)

    f = codes.shape[1]
    n_slots = n_audio_codebooks + 1
    frame = np.zeros((f, n_slots), dtype=np.int32)
    mask = np.zeros((f, n_slots), dtype=np.int32)
    frame[:, :-1] = codes.T
    mask[:, :-1] = 1
    return frame, mask


def tokenize_segment(
    segment: Segment, *, n_audio_codebooks: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    """Text frames then audio frames for one conversation turn -> (S, 33) x2."""
    text_tokens, text_masks = tokenize_text_segment(
        segment.text, segment.speaker, n_audio_codebooks)
    audio_tokens, audio_masks = tokenize_audio(
        segment.audio, n_audio_codebooks=n_audio_codebooks
    )
    return (
        np.concatenate([text_tokens, audio_tokens], axis=0).astype(np.int32),
        np.concatenate([text_masks, audio_masks], axis=0).astype(np.int32),
    )


def tokenize_segments_with_loss_mask(
    segments: List[Segment],
    *,
    n_audio_codebooks: int = 32,
    mask_speaker_ids: List[int],
    max_audio_length_ms: Optional[int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate turns; zero the loss mask for masked speakers' rows;
    truncate to max_audio_length_ms/80 rows (tokenizers.py:105-145)."""
    tokens_list, masks_list = zip(
        *[tokenize_segment(s, n_audio_codebooks=n_audio_codebooks) for s in segments]
    )
    tokens = np.concatenate(tokens_list, axis=0)
    masks = np.concatenate(masks_list, axis=0)
    loss_masks = np.ones_like(tokens)

    pos = 0
    for seg_tokens, segment in zip(tokens_list, segments):
        n = seg_tokens.shape[0]
        if segment.speaker in mask_speaker_ids:
            loss_masks[pos : pos + n] = 0
        pos += n

    if max_audio_length_ms is not None:
        max_rows = int(max_audio_length_ms / 80)
        tokens = tokens[:max_rows]
        masks = masks[:max_rows]
        loss_masks = loss_masks[:max_rows]
    return tokens, masks, loss_masks


def decode_audio(audio_tokens, *, n_audio_codebooks: int = 32):
    """(B, K, F) codes -> (B, 1, T) waveform via Mimi (tokenizers.py:148-150)."""
    audio_tokenizer = get_audio_tokenizer(n_audio_codebooks)
    return audio_tokenizer.decode(audio_tokens)
