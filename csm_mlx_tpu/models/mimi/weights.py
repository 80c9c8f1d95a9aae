"""Mimi checkpoint loading: HF (`kyutai/mimi`) and moshi
(`kyutai/moshiko-pytorch-bf16` `tokenizer-e351c8d8-checkpoint125.safetensors`,
the file the reference downloads at `csm_mlx/tokenizers.py:17` /
`config.py:48-51`) naming schemes.

Both map onto the same parameter pytree (see seanet.py / transformer.py /
rvq.py). Differences handled here:
- moshi nests convs as `*.conv.conv.*` / `*.convtr.convtr.*`; HF uses
  `*.conv.*`.
- moshi fuses attention qkv as `in_proj_weight`; HF splits q/k/v. Moshi
  applies *interleaved* RoPE while this implementation (like HF) uses the
  half-split convention, so moshi q/k rows are permuted per head:
  (head, pair, 2) -> (head, 2, pair) — the standard Llama-conversion
  permutation.
- codebooks are running stats (`embed_sum`/`embedding_sum` + cluster_usage).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.models.mimi.config import MimiConfig


def _set(tree: Dict[str, Any], path, value) -> None:
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {}) if isinstance(p, str) else cur[p]
    cur[path[-1]] = value


def _seanet_index_maps(cfg: MimiConfig, is_encoder: bool):
    """layer-list index -> tree path, for the flattened nn.ModuleList layout
    (ELUs occupy indices; R = num_residual_layers)."""
    r = cfg.num_residual_layers
    paths = {0: ("init",)}
    idx = 1
    n_stages = len(cfg.upsampling_ratios)
    for s in range(n_stages):
        if is_encoder:
            for j in range(r):
                paths[idx] = ("stages", s, "residual", j)
                idx += 1
            idx += 1  # ELU
            paths[idx] = ("stages", s, "down")
            idx += 1
        else:
            idx += 1  # ELU
            paths[idx] = ("stages", s, "up")
            idx += 1
            for j in range(r):
                paths[idx] = ("stages", s, "residual", j)
                idx += 1
    idx += 1  # ELU
    paths[idx] = ("final",)
    return paths


def _permute_rope_rows(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Interleaved -> half-split RoPE row permutation for q/k projections."""
    out_dim, in_dim = w.shape
    head_dim = out_dim // n_heads
    return (
        w.reshape(n_heads, head_dim // 2, 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(out_dim, in_dim)
    )


def map_mimi_state_dict(
    state: Dict[str, np.ndarray], cfg: MimiConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Map a raw checkpoint dict (HF or moshi naming) to the param pytree."""
    tree: Dict[str, Any] = {
        "encoder": {"stages": [
            {"residual": [{} for _ in range(cfg.num_residual_layers)]}
            for _ in cfg.upsampling_ratios
        ]},
        "decoder": {"stages": [
            {"residual": [{} for _ in range(cfg.num_residual_layers)]}
            for _ in cfg.upsampling_ratios
        ]},
        "encoder_transformer": {"layers": [{} for _ in range(cfg.num_hidden_layers)]},
        "decoder_transformer": {"layers": [{} for _ in range(cfg.num_hidden_layers)]},
        "quantizer": {
            "semantic": {"layers": [{} for _ in range(cfg.num_semantic_quantizers)]},
            "acoustic": {"layers": [{} for _ in range(cfg.num_acoustic_quantizers)]},
        },
        "downsample": {},
        "upsample": {},
    }

    enc_map = _seanet_index_maps(cfg, True)
    dec_map = _seanet_index_maps(cfg, False)

    def put(path, value):
        _set(tree, path, jnp.asarray(np.asarray(value), dtype=dtype))

    unused = []
    for name, value in state.items():
        v = np.asarray(value)
        # ---- SEANet convs -------------------------------------------------
        m = re.match(
            r"(encoder|decoder)\.(?:model|layers)\.(\d+)"
            r"(?:\.block\.(\d+))?\.(?:conv|convtr)(?:\.(?:conv|convtr))?"
            r"\.(weight|bias)$",
            name,
        )
        if m:
            part, idx, block_idx, leaf = m.groups()
            idx = int(idx)
            base = (part,) + (enc_map if part == "encoder" else dec_map)[idx]
            if block_idx is not None:
                sub = "conv1" if int(block_idx) == 1 else "conv2"
                put(base + (sub, leaf), v)
            else:
                put(base + (leaf,), v)
            continue
        # ---- down/upsample ------------------------------------------------
        m = re.match(
            r"(downsample|upsample)\.(?:conv|convtr)(?:\.(?:conv|convtr))?"
            r"\.(weight|bias)$",
            name,
        )
        if m:
            put((m.group(1), m.group(2)), v)
            continue
        # ---- transformers -------------------------------------------------
        m = re.match(
            r"(encoder_transformer|decoder_transformer)\.(?:transformer\.)?layers\.(\d+)\.(.+)$",
            name,
        )
        if m:
            tname, li, rest = m.group(1), int(m.group(2)), m.group(3)
            base = (tname, "layers", li)
            if rest == "self_attn.in_proj_weight":  # moshi fused qkv
                # The equal-thirds split below is MHA-only; a GQA config
                # would silently assign q rows to k — refuse instead.
                if cfg.num_key_value_heads != cfg.num_attention_heads:
                    raise ValueError(
                        "moshi fused in_proj_weight requires MHA (kv heads "
                        f"== heads); got {cfg.num_key_value_heads} != "
                        f"{cfg.num_attention_heads}")
                d = cfg.hidden_size
                q, k, vv = v[:d], v[d: 2 * d], v[2 * d:]
                put(base + ("self_attn", "q_proj", "weight"),
                    _permute_rope_rows(q, cfg.num_attention_heads))
                put(base + ("self_attn", "k_proj", "weight"),
                    _permute_rope_rows(k, cfg.num_key_value_heads))
                put(base + ("self_attn", "v_proj", "weight"), vv)
                continue
            hf_rest = {
                "self_attn.out_proj.weight": ("self_attn", "o_proj", "weight"),
                "self_attn.q_proj.weight": ("self_attn", "q_proj", "weight"),
                "self_attn.k_proj.weight": ("self_attn", "k_proj", "weight"),
                "self_attn.v_proj.weight": ("self_attn", "v_proj", "weight"),
                "self_attn.o_proj.weight": ("self_attn", "o_proj", "weight"),
                "norm1.weight": ("input_layernorm", "weight"),
                "norm1.bias": ("input_layernorm", "bias"),
                "norm2.weight": ("post_attention_layernorm", "weight"),
                "norm2.bias": ("post_attention_layernorm", "bias"),
                "input_layernorm.weight": ("input_layernorm", "weight"),
                "input_layernorm.bias": ("input_layernorm", "bias"),
                "post_attention_layernorm.weight": ("post_attention_layernorm", "weight"),
                "post_attention_layernorm.bias": ("post_attention_layernorm", "bias"),
                "linear1.weight": ("mlp", "fc1", "weight"),
                "linear2.weight": ("mlp", "fc2", "weight"),
                "mlp.fc1.weight": ("mlp", "fc1", "weight"),
                "mlp.fc2.weight": ("mlp", "fc2", "weight"),
                "layer_scale_1.scale": ("self_attn_layer_scale", "scale"),
                "layer_scale_2.scale": ("mlp_layer_scale", "scale"),
                "self_attn_layer_scale.scale": ("self_attn_layer_scale", "scale"),
                "mlp_layer_scale.scale": ("mlp_layer_scale", "scale"),
            }
            if rest in hf_rest:
                put(base + hf_rest[rest], v)
                continue
            unused.append(name)
            continue
        # ---- quantizer ----------------------------------------------------
        m = re.match(
            r"quantizer\.(rvq_first|rvq_rest|semantic_residual_vector_quantizer|"
            r"acoustic_residual_vector_quantizer)\.(.+)$",
            name,
        )
        if m:
            which = "semantic" if m.group(1) in (
                "rvq_first", "semantic_residual_vector_quantizer") else "acoustic"
            rest = m.group(2)
            mm = re.match(r"(input_proj|output_proj)(?:\.conv)?\.weight$", rest)
            if mm:
                put(("quantizer", which, mm.group(1), "weight"), v)
                continue
            mm = re.match(
                r"(?:vq\.)?layers\.(\d+)\.(?:_codebook|codebook)\."
                r"(embedding_sum|embed_sum|cluster_usage|embed|initialized|"
                r"cluster_size)$",
                rest,
            )
            if mm:
                li, leaf = int(mm.group(1)), mm.group(2)
                if leaf == "initialized":
                    continue
                leaf = {"embedding_sum": "embed_sum", "cluster_size":
                        "cluster_usage"}.get(leaf, leaf)
                put(("quantizer", which, "layers", li, "codebook", leaf), v)
                continue
            unused.append(name)
            continue
        unused.append(name)

    if unused:
        # Benign extras (masks, buffers); surface for debugging.
        import logging

        logging.getLogger(__name__).info(
            "mimi loader: %d unused checkpoint keys (e.g. %s)",
            len(unused), unused[:5],
        )
    return tree


def load_mimi_checkpoint(path: str, cfg: MimiConfig, dtype=jnp.float32):
    # numpy reader with the torch fallback for bf16 tensors, failing with
    # the ORIGINAL error (missing file, corrupt header) when both readers
    # fail — the same hardened path the model checkpoints use.
    from csm_mlx_tpu.loaders import _load_flat

    return map_mimi_state_dict(_load_flat(path), cfg, dtype=dtype)
