"""Split residual vector quantizer (1 semantic + N-1 acoustic codebooks).

Architecture per kyutai/mimi: both RVQs see the *same* 12.5 Hz latent
(semantic is not chained into acoustic); each RVQ projects 512->256 with a
1x1 conv (no bias), quantizes residually against 2048-entry codebooks stored
as (embed_sum, cluster_usage) running stats (embedding = embed_sum /
max(cluster_usage, eps)), and projects back 256->512. Decode is a pure
embedding-sum — on TPU it is a batched gather + matmul-free reduction that
XLA fuses with the upsample conv.

The reference calls this through moshi_mlx
(`/root/reference/csm_mlx/tokenizers.py:70`, `:150`).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.models.mimi.config import MimiConfig

Params = Dict[str, Any]
EPS = 1e-5


def codebook_embed(cb: Params) -> jax.Array:
    """(codebook_size, dim) embedding table from running stats."""
    if "embed" in cb:
        return cb["embed"]
    usage = jnp.maximum(cb["cluster_usage"], EPS)
    return cb["embed_sum"] / usage[:, None]


def _proj(p: Params, x: jax.Array) -> jax.Array:
    """1x1 conv projection on (B, C, T) (kernel dim squeezed)."""
    w = p["weight"]
    if w.ndim == 3:
        w = w[:, :, 0]
    return jnp.einsum("bct,oc->bot", x, w.astype(x.dtype))


def _nearest(x: jax.Array, embed: jax.Array) -> jax.Array:
    """Nearest codebook index under L2. x: (..., D); embed: (V, D)."""
    xf = x.astype(jnp.float32)
    ef = embed.astype(jnp.float32)
    # argmin ||x - e||^2 = argmin (-2 x.e + ||e||^2): one MXU matmul.
    scores = (
        2.0 * jnp.einsum("...d,vd->...v", xf, ef)
        - jnp.sum(ef * ef, axis=-1)
    )
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def rvq_encode(params: Params, x: jax.Array, num_quantizers: int) -> jax.Array:
    """Residual encode. x: (B, C, T) -> codes (B, K, T)."""
    if "input_proj" in params:
        x = _proj(params["input_proj"], x)
    residual = x.transpose(0, 2, 1)  # (B, T, D)
    codes = []
    for layer in params["layers"][:num_quantizers]:
        embed = codebook_embed(layer["codebook"])
        idx = _nearest(residual, embed)
        codes.append(idx)
        residual = residual - embed[idx].astype(residual.dtype)
    return jnp.stack(codes, axis=1)  # (B, K, T)


def rvq_decode(params: Params, codes: jax.Array) -> jax.Array:
    """codes (B, K, T) -> (B, C, T) quantized latent."""
    total = None
    for i, layer in enumerate(params["layers"]):
        embed = codebook_embed(layer["codebook"])
        q = embed[codes[:, i]]  # (B, T, D)
        total = q if total is None else total + q
    out = total.transpose(0, 2, 1)  # (B, D, T)
    if "output_proj" in params:
        out = _proj(params["output_proj"], out)
    return out


def split_rvq_encode(params: Params, x: jax.Array, num_quantizers: int) -> jax.Array:
    """Split RVQ: semantic and acoustic both quantize the raw latent."""
    n_sem = len(params["semantic"]["layers"])
    codes = [rvq_encode(params["semantic"], x, n_sem)]
    if num_quantizers > n_sem:
        codes.append(rvq_encode(params["acoustic"], x, num_quantizers - n_sem))
    return jnp.concatenate(codes, axis=1)


def split_rvq_decode(params: Params, codes: jax.Array) -> jax.Array:
    n_sem = len(params["semantic"]["layers"])
    out = rvq_decode(params["semantic"], codes[:, :n_sem])
    if codes.shape[1] > n_sem:
        acoustic = {**params["acoustic"]}
        acoustic["layers"] = params["acoustic"]["layers"][: codes.shape[1] - n_sem]
        out = out + rvq_decode(acoustic, codes[:, n_sem:])
    return out


def init_rvq_params(
    key: jax.Array, cfg: MimiConfig, n_layers: int, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    layers = [
        {
            "codebook": {
                "embed_sum": (
                    jax.random.normal(
                        jax.random.fold_in(k3, i),
                        (cfg.codebook_size, cfg.codebook_dim),
                    )
                ).astype(dtype),
                "cluster_usage": jnp.ones((cfg.codebook_size,), dtype),
            }
        }
        for i in range(n_layers)
    ]
    p: Params = {"layers": layers}
    if cfg.codebook_dim != cfg.hidden_size:
        p["input_proj"] = {
            "weight": (
                jax.random.normal(k1, (cfg.codebook_dim, cfg.hidden_size))
                * cfg.hidden_size ** -0.5
            ).astype(dtype)
        }
        p["output_proj"] = {
            "weight": (
                jax.random.normal(k2, (cfg.hidden_size, cfg.codebook_dim))
                * cfg.codebook_dim ** -0.5
            ).astype(dtype)
        }
    return p


def init_split_rvq_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "semantic": init_rvq_params(k1, cfg, cfg.num_semantic_quantizers, dtype),
        "acoustic": init_rvq_params(k2, cfg, cfg.num_acoustic_quantizers, dtype),
    }
