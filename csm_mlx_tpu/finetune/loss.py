"""CSM training loss — exact semantics of
`/root/reference/csm_mlx/finetune/trainer.py:202-318`.

Per batch of (B, S, 33) frame tokens with input masks and loss masks:
- the backbone consumes positions 0..S-2 (masked-sum embeddings) and
  predicts codebook-0 of the *next* frame (shift-by-one targets), scored by
  `codebook0_head` and weighted by `first_codebook_weight_multiplier`;
- the decoder is re-run teacher-forced for every frame: rows are reshaped to
  (B*(S-1), 33, D) so each frame's [backbone_hidden, 32 audio embeds]
  sequence is an independent decoder batch row; codebooks 1..31 are scored
  against `audio_head[i-1]`;
- each codebook's CE is mask-averaged, then averaged over the 32 codebooks.

TPU-native additions over the reference:
- `decoder_loss_fraction` implements Sesame's compute amortization (the
  reference's acknowledged TODO at trainer.py:257): train the decoder on a
  random subset of frame positions, cutting the dominant memory/FLOPs term.
- safe masked means (no NaN when a codebook has zero valid targets).
- fp32 logits/CE regardless of param dtype.

`per_sample=True` returns (B,) losses for DPO/KTO; `cause_mismatch=True`
rolls targets by one frame for the KTO KL proxy (trainer.py:271-274).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.models.csm import ModelArgs, embed_tokens
from csm_mlx_tpu.models.llama import llama_forward
from csm_mlx_tpu.ops.attention import causal_mask_bias
from csm_mlx_tpu.ops.layers import emb_table, linear
from csm_mlx_tpu.ops.rope import rope_cache_for


def _cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-element CE in fp32 (mlx cross_entropy reduction='none')."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return logz - picked


def _masked_mean(values: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    m = mask.astype(jnp.float32)
    denom = m.sum(axis=axis)
    return (values * m).sum(axis=axis) / jnp.maximum(denom, 1e-9)


def compute_loss(
    params: Dict[str, Any],
    args: ModelArgs,
    batch: Dict[str, jax.Array],
    *,
    per_sample: bool = False,
    cause_mismatch: bool = False,
    first_codebook_weight_multiplier: float | jax.Array = 1.0,
    decoder_loss_fraction: float = 1.0,
    remat: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    tokens = batch["tokens"]          # (B, S, 33) int32
    masks = batch["masks"]            # (B, S, 33) 0/1
    loss_masks = batch["loss_masks"]  # (B, S, 33) 0/1
    fcw = batch.get("first_codebook_weight_multiplier",
                    first_codebook_weight_multiplier)

    b, s, n_slots = tokens.shape
    n_cb = args.n_audio_codebooks
    bcfg, dcfg = args.backbone_config, args.decoder_config

    audio_tokens = tokens[:, :, :-1]
    shifted_audio_tokens = audio_tokens[:, 1:, :]          # (B, S-1, K)
    shifted_audio_masks = masks[:, :, :-1][:, 1:, :]
    shifted_loss_masks = loss_masks[:, :, :-1][:, 1:, :]
    valid = (shifted_audio_masks & shifted_loss_masks).astype(jnp.float32)

    # cause_mismatch (KTO KL proxy, trainer.py:271-274) rolls only the CE
    # *targets*; the decoder's teacher-forcing inputs (ci_emb below) come from
    # the unrolled sequence, exactly as the reference builds ci_stacked before
    # applying the roll.
    target_tokens = shifted_audio_tokens
    if cause_mismatch:
        target_tokens = jnp.concatenate(
            [shifted_audio_tokens[:, 1:], shifted_audio_tokens[:, :1]], axis=1
        )

    # ---- backbone over the (masked-sum) input frames -------------------
    emb = embed_tokens(params, args, tokens)
    backbone_input = (emb * masks[..., None].astype(emb.dtype)).sum(-2)[:, :-1]
    cos_b, sin_b = rope_cache_for(bcfg, s)
    # Long sequences run the differentiable flash-attention kernels
    # (ops/flash_train.py): no (B,H,S,S) fp32 logits in HBM in either pass —
    # ~2 GB/layer saved at the reference's max window (S=2048, B=4). The
    # dataset right-pads, so pure causal masking (in-kernel) is exact here.
    # CSM_TPU_FLASH_TRAIN = minimum S to engage (0 disables). Under an
    # activation-sharding mesh the kernels run inside shard_map (batch over
    # "data", kv heads over "model"; flash_attention wraps itself) — the
    # multi-chip long-sequence runs that most need the memory win no longer
    # fall back to the einsum path.
    flash_min = int(os.environ.get("CSM_TPU_FLASH_TRAIN", "512"))
    use_flash = flash_min > 0 and (s - 1) >= flash_min
    hidden, _ = llama_forward(
        params["backbone"], bcfg, backbone_input, cos_b, sin_b,
        jnp.arange(s - 1)[None],
        None if use_flash else causal_mask_bias(s - 1, s - 1)[None, None],
        None, remat=remat, flash_train=use_flash,
    )  # (B, S-1, D)

    c0_logits = linear(params["codebook0_head"], hidden)
    c0_ce = _cross_entropy(c0_logits, target_tokens[:, :, 0])
    if per_sample:
        c0_loss = _masked_mean(c0_ce, valid[:, :, 0], axis=-1) * fcw
    else:
        c0_loss = _masked_mean(c0_ce, valid[:, :, 0]) * fcw
    total = c0_loss / n_cb

    # ---- teacher-forced decoder over frame rows ------------------------
    # Optional compute amortization: subsample frame positions.
    n_rows = b * (s - 1)
    offsets = jnp.arange(n_cb, dtype=tokens.dtype) * args.n_audio_vocab
    ci_emb = emb_table(params["audio_embeddings"])[
        shifted_audio_tokens + offsets
    ]  # (B, S-1, K, D)
    dec_in = jnp.concatenate([hidden[:, :, None, :], ci_emb], axis=-2)
    dec_in = dec_in.reshape(n_rows, n_cb + 1, -1)

    row_valid = valid  # (B, S-1, K)
    row_targets = target_tokens

    if decoder_loss_fraction < 1.0:
        k = max(int(n_rows * decoder_loss_fraction), 1)
        if rng is None:
            # A constant fallback key would sample the SAME row subset on
            # every step — the other 1-fraction of frame positions would
            # never receive decoder gradients. The trainer threads a
            # per-step rng; direct callers must too.
            raise ValueError(
                "decoder_loss_fraction < 1.0 requires rng= (a fresh key per "
                "step); a fixed subsample would never train the other rows")
        perm = jax.random.permutation(rng, n_rows)[:k]
        dec_in = dec_in[perm]
        row_valid = row_valid.reshape(n_rows, n_cb)[perm].reshape(1, k, n_cb)
        row_targets = row_targets.reshape(n_rows, n_cb)[perm].reshape(1, k, n_cb)
        eff_rows = k
        if per_sample:
            raise ValueError(
                "decoder_loss_fraction < 1.0 is incompatible with per-sample "
                "losses (DPO/KTO)"
            )
    else:
        eff_rows = n_rows

    dec_proj = linear(params["projection"], dec_in)
    cos_d, sin_d = rope_cache_for(dcfg, n_cb + 1)
    dec_hidden, _ = llama_forward(
        params["decoder"], dcfg, dec_proj, cos_d, sin_d,
        jnp.arange(n_cb + 1)[None],
        causal_mask_bias(n_cb + 1, n_cb + 1)[None, None], None, remat=remat,
    )  # (rows, K+1, Dd)
    # Positions 1..K-1 predict codebooks 1..K-1 (drop c0 row and the last).
    dec_hidden = dec_hidden[:, 1:-1, :]  # (rows, K-1, Dd)

    # Score all 31 codebooks in one batched einsum against audio_head.
    ci_logits = jnp.einsum(
        "rkd,kdv->rkv", dec_hidden.astype(jnp.float32),
        params["audio_head"].astype(jnp.float32),
    )  # (rows, K-1, V)
    tgt = row_targets.reshape(eff_rows, n_cb)[:, 1:]
    vmask = row_valid.reshape(eff_rows, n_cb)[:, 1:]
    ci_ce = _cross_entropy(ci_logits, tgt)  # (rows, K-1)

    if per_sample:
        ci_ce_b = ci_ce.reshape(b, s - 1, n_cb - 1)
        vmask_b = vmask.reshape(b, s - 1, n_cb - 1)
        per_cb = _masked_mean(
            ci_ce_b.transpose(0, 2, 1), vmask_b.transpose(0, 2, 1),
            axis=-1,
        )  # (B, K-1)
        total = total + per_cb.sum(axis=-1) / n_cb
    else:
        # Per-codebook masked mean then average (matches the reference's
        # per-codebook normalization, trainer.py:298-316).
        per_cb = _masked_mean(ci_ce.T, vmask.T, axis=-1)  # (K-1,)
        total = total + per_cb.sum() / n_cb

    return total
