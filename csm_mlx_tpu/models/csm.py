"""CSM dual-transformer model (backbone + RVQ decoder), TPU-native.

Capability-parity rebuild of `/root/reference/csm_mlx/models.py:31-92`:

- `text_embeddings` (128256, 2048) and a *fused* `audio_embeddings` table of
  (n_audio_vocab * n_codebooks, 2048) rows indexed by
  `token + codebook * n_audio_vocab` (models.py:79-80),
- per-step input = masked sum of the 32 audio-slot embeddings + the text-slot
  embedding (models.py:82-92, generation.py:34-36),
- `projection` 2048->1024 feeding the decoder, `codebook0_head` 2048->2051,
  and the `audio_head` tensor (31, 1024, 2051) scoring codebooks 1..31.

The class is a thin stateful shell over a parameter pytree; all compute is in
pure functions so it jits/shards/differentiates cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from csm_mlx_tpu.config import (
    BACKBONE_CONFIGURATION,
    DECODER_CONFIGURATION,
    LlamaConfig,
)
from csm_mlx_tpu.models.llama import init_llama_params
from csm_mlx_tpu.ops.layers import emb_table

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelArgs:
    """Mirror of the reference ModelArgs (models.py:12-18)."""

    backbone_name: str
    decoder_name: str
    n_text_vocab: int
    n_audio_vocab: int
    n_audio_codebooks: int

    @property
    def backbone_config(self) -> LlamaConfig:
        return BACKBONE_CONFIGURATION[self.backbone_name]

    @property
    def decoder_config(self) -> LlamaConfig:
        return DECODER_CONFIGURATION[self.decoder_name]

    @property
    def backbone_dim(self) -> int:
        cfg = self.backbone_config
        return cfg.num_attention_heads * cfg.head_dim

    @property
    def decoder_dim(self) -> int:
        cfg = self.decoder_config
        return cfg.num_attention_heads * cfg.head_dim


def csm_1b() -> ModelArgs:
    """The CSM-1B configuration (models.py:21-28)."""
    return ModelArgs(
        backbone_name="1b",
        decoder_name="100m",
        n_text_vocab=128_256,
        n_audio_vocab=2051,
        n_audio_codebooks=32,
    )


def init_csm_params(key: jax.Array, args: ModelArgs, dtype=jnp.float32) -> Params:
    """Random-initialized CSM parameter pytree (checkpoint layout)."""
    keys = jax.random.split(key, 6)
    d_b, d_d = args.backbone_dim, args.decoder_dim
    scale = d_b ** -0.5
    return {
        "backbone": init_llama_params(keys[0], args.backbone_config, dtype),
        "decoder": init_llama_params(keys[1], args.decoder_config, dtype),
        "text_embeddings": {
            "weight": (
                jax.random.normal(keys[2], (args.n_text_vocab, d_b)) * scale
            ).astype(dtype)
        },
        "audio_embeddings": {
            "weight": (
                jax.random.normal(
                    keys[3], (args.n_audio_vocab * args.n_audio_codebooks, d_b)
                )
                * scale
            ).astype(dtype)
        },
        "projection": {
            "weight": (jax.random.normal(keys[4], (d_d, d_b)) * scale).astype(dtype)
        },
        "codebook0_head": {
            "weight": (
                jax.random.normal(keys[5], (args.n_audio_vocab, d_b)) * scale
            ).astype(dtype)
        },
        "audio_head": jnp.zeros(
            (args.n_audio_codebooks - 1, d_d, args.n_audio_vocab), dtype=dtype
        ),
    }


def embed_audio(params: Params, args: ModelArgs, codebook: int | jax.Array, tokens: jax.Array) -> jax.Array:
    """Embedding of `tokens` under codebook #`codebook` (models.py:79-80)."""
    return emb_table(params["audio_embeddings"])[tokens + codebook * args.n_audio_vocab]


def embed_tokens(params: Params, args: ModelArgs, tokens: jax.Array) -> jax.Array:
    """Per-slot embeddings of a (B, S, 33) frame tensor -> (B, S, 33, D).

    Slot 32 is the text token; slots 0..31 are audio tokens offset into the
    fused table (models.py:82-92).
    """
    text_embeds = emb_table(params["text_embeddings"])[tokens[:, :, -1]][:, :, None, :]
    offsets = jnp.arange(args.n_audio_codebooks, dtype=tokens.dtype) * args.n_audio_vocab
    audio_embeds = emb_table(params["audio_embeddings"])[tokens[:, :, :-1] + offsets]
    return jnp.concatenate([audio_embeds, text_embeds], axis=-2)


def masked_input_embeds(
    params: Params, args: ModelArgs, tokens: jax.Array, token_mask: jax.Array
) -> jax.Array:
    """Masked sum over the 33 slots -> backbone input (generation.py:34-36)."""
    emb = embed_tokens(params, args, tokens)
    return (emb * token_mask[..., None].astype(emb.dtype)).sum(axis=-2)


class CSM:
    """Public model object, API-compatible with the reference `CSM`.

    Usage: `model = CSM(csm_1b()); model.load_weights(path)`. Heavy lifting
    lives in the functional API (this module + csm_mlx_tpu.generation); the
    class carries `params` (a pytree) plus configuration.
    """

    def __init__(
        self,
        args: ModelArgs,
        params: Optional[Params] = None,
        dtype=jnp.bfloat16,
        rng: Optional[jax.Array] = None,
        init: bool = True,
    ):
        self.args = args
        self.n_text_vocab = args.n_text_vocab
        self.n_audio_vocab = args.n_audio_vocab
        self.n_audio_codebooks = args.n_audio_codebooks
        self.n_backbone_embedding = args.backbone_dim
        self.n_decoder_embedding = args.decoder_dim
        self.dtype = dtype
        if params is None and init:
            # `init=False` skips the multi-GB random draw for callers that
            # load a full checkpoint immediately (the CLI paths) — a strict
            # load replaces the whole tree anyway.
            params = init_csm_params(
                rng if rng is not None else jax.random.PRNGKey(0), args, dtype
            )
        self.params = params

    # --- weight IO -----------------------------------------------------
    def load_weights(self, path: str, strict: bool = True) -> "CSM":
        from csm_mlx_tpu.loaders import load_csm_weights

        self.params = load_csm_weights(path, self.args, dtype=self.dtype,
                                       strict=strict, existing=self.params)
        return self

    def save_weights(self, path: str) -> None:
        from csm_mlx_tpu.loaders import save_csm_weights

        save_csm_weights(path, self.params)

    # --- convenience mirrors of the reference methods ------------------
    def embed_audio(self, codebook: int, tokens: jax.Array) -> jax.Array:
        return embed_audio(self.params, self.args, codebook, tokens)

    def embed_tokens(self, tokens: jax.Array) -> jax.Array:
        return embed_tokens(self.params, self.args, tokens)
