"""Safetensors <-> parameter-pytree conversion for CSM checkpoints.

The reference stores CSM weights as flat dot-separated safetensors
(`senstella/csm-1b-mlx` `ckpt.safetensors`; saving at
`/root/reference/csm_mlx/finetune/trainer.py:109` uses `tree_flatten` of the
module tree). Our in-memory pytree uses the same names and tensor layouts
(Linear (out, in), embeddings (vocab, dim), `audio_head` (31, d, vocab)), so
loading is pure renaming:

  backbone.layers.{i}.self_attn.q_proj.weight  -> params["backbone"]["layers"][i]...
  text_embeddings.weight                        -> params["text_embeddings"]["weight"]
  audio_head                                    -> params["audio_head"]

Weight resolution order mirrors `cli/generate.py:19-49`: a local file path,
or an HF repo trying `mlx-ckpt.safetensors` -> `ckpt.safetensors` ->
`latest.safetensors`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.models.csm import ModelArgs

WEIGHT_FILE_CANDIDATES = ("mlx-ckpt.safetensors", "ckpt.safetensors",
                          "latest.safetensors")


def _load_flat(path: str) -> Dict[str, np.ndarray]:
    if not os.path.exists(path):
        # Fail with the real cause — the torch fallback below would
        # otherwise mask a missing file behind its own error.
        raise FileNotFoundError(f"checkpoint not found: {path!r}")
    from safetensors.numpy import load_file

    try:
        return load_file(path)
    except Exception as numpy_err:
        # bf16 tensors need the torch reader; for anything else (corrupt
        # file, wrong format) re-raise the ORIGINAL numpy-reader error.
        try:
            import torch
            from safetensors.torch import load_file as load_torch

            # Widen ONLY bf16 (numpy has no bf16 dtype); int8 quant codes
            # and f32 scales must keep their exact dtype through this path.
            return {k: (v.float().numpy() if v.dtype == torch.bfloat16
                        else v.numpy())
                    for k, v in load_torch(path).items()}
        except Exception:
            raise numpy_err


def flat_to_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    """'a.layers.3.b' flat keys -> nested dicts with real lists for layers."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        cur = tree
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if p.isdigit():
                p = int(p)
            if isinstance(p, int):
                while len(cur) <= p:
                    cur.append({})
                if not isinstance(cur[p], (dict, list)):
                    cur[p] = {}
                cur = cur[p]
                continue
            if p not in cur:
                cur[p] = [] if nxt.isdigit() else {}
            cur = cur[p]
        last = parts[-1]
        if last.isdigit():
            idx = int(last)
            while len(cur) <= idx:
                cur.append(None)
            cur[idx] = value
        else:
            cur[last] = value
    return tree


def tree_to_flat(tree: Any, prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if isinstance(k, str) and k.startswith("_"):
                # Derived caches (e.g. the "_resident" decoder tables) are
                # rebuildable from the real weights — never checkpointed.
                continue
            flat.update(tree_to_flat(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(tree_to_flat(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = tree
    return flat


def load_csm_weights(
    path: str,
    args: ModelArgs,
    dtype=jnp.bfloat16,
    strict: bool = True,
    existing: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Load a reference-format checkpoint into the CSM parameter pytree.

    With strict=False, missing keys keep the `existing` values (used for
    trainable-only checkpoints / adapters, cf. trainer.py:114-117).
    """
    flat = _load_flat(path)
    # MLX checkpoints may serialize non-parameter module arrays (e.g. the
    # torchtune-style rope cos/sin caches `rope._cache` / `rope._theta`,
    # attention.py:77,:92) — drop them; rope is recomputed here.
    flat = {k: v for k, v in flat.items()
            if ".rope." not in k and not k.endswith("._cache")
            and not k.endswith("._theta")}
    tree = flat_to_tree({k: _cast_leaf(k, v, dtype) for k, v in flat.items()})
    if strict:
        required = ("backbone", "decoder", "text_embeddings", "audio_embeddings",
                    "projection", "codebook0_head", "audio_head")
        missing = [k for k in required if k not in tree]
        if missing:
            raise ValueError(f"Checkpoint {path} missing components: {missing}")
        return tree
    # Copy the dict/list spine before merging (arrays are shared): _merge
    # writes into and evicts from nested dicts, and doing that to the
    # caller's live tree would corrupt stashed copies / models sharing it.
    merged = _copy_spine(existing or {})
    _merge(merged, tree)
    # Derived "_"-prefixed caches (e.g. the "_resident" frame-kernel tables)
    # snapshot the weights they were built from; a partial load would leave
    # them serving STALE weights while the dispatched path uses the new ones
    # (trainer.__init__ and parallel.shard_model drop them for the same
    # reason). Re-derive via quantize_model/prepare_resident_decoder.
    for k in [k for k in merged if isinstance(k, str) and k.startswith("_")]:
        del merged[k]
    return merged


def _cast_leaf(key: str, v: Any, dtype) -> jnp.ndarray:
    """Cast a checkpoint tensor to the model dtype — floats only.

    Integer leaves (int8/uint8/int4 quantized codes) and the f32 `scales`/
    `biases` that calibrate them must keep their exact dtype: casting codes
    to bf16 silently disables the W8A8 MXU kernel and the resident decoder
    (both dispatch on `weight_q.dtype`), and bf16 scales degrade every
    dequantized weight."""
    arr = jnp.asarray(v)
    if not jnp.issubdtype(arr.dtype, jnp.floating):
        return arr
    if key.rsplit(".", 1)[-1] in ("scales", "biases"):
        return arr
    return arr.astype(dtype)


def _copy_spine(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _copy_spine(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_copy_spine(v) for v in tree]
    return tree


_FUSED_GROUPS = (("qkv_proj", ("q_proj", "k_proj", "v_proj")),
                 ("gateup_proj", ("gate_proj", "up_proj")))


def _merge(dst: Any, src: Any) -> Any:
    if isinstance(src, dict) and isinstance(dst, dict):
        # Evict representations the checkpoint SUPERSEDES, not just merge
        # keys: ops.layers.linear prefers `weight_q` and _attn_layer prefers
        # `qkv_proj`, so a new dense/unfused weight merged NEXT TO a stale
        # quantized/fused sibling would be silently ignored — the loaded
        # fine-tune would not actually serve. (Same staleness class as the
        # top-level "_" caches dropped in load_csm_weights.)
        if "weight" in src and "weight_q" not in src:
            for k in ("weight_q", "scales", "biases"):
                dst.pop(k, None)
        if "weight_q" in src and "weight" not in src:
            dst.pop("weight", None)
        for fused, parts in _FUSED_GROUPS:
            if fused in src:
                # The checkpoint carries the fused form, which the forward
                # path prefers: adapters sitting on the unfused projections
                # would silently stop applying (_attn_layer reads only
                # `fused` when present) — fail loudly; and the parts' base
                # weights become dead copies — evict them.
                adapted = [p for p in parts
                           if isinstance(dst.get(p), dict)
                           and "lora_a" in dst[p]]
                if adapted:
                    raise ValueError(
                        f"checkpoint provides {fused!r} but the model "
                        f"carries LoRA adapters on {adapted}, which the "
                        f"fused forward path would silently ignore. Fuse or "
                        f"strip the adapters before loading this checkpoint.")
                for p in parts:
                    if isinstance(dst.get(p), dict):
                        for k in ("weight", "weight_q", "scales", "biases"):
                            dst[p].pop(k, None)
                        if not dst[p]:
                            dst.pop(p)
                continue
            if fused not in dst:
                continue
            named = [p for p in parts if p in src]
            if not named:
                continue
            # Evicting the fused weight is only safe when the checkpoint
            # replaces EVERY constituent's base weight — the fused array is
            # the model's ONLY copy of the others. A partial update (subset
            # fine-tune, or an adapter-only q_proj dict) can never serve
            # against a fused model (the forward path reads `fused` and
            # would silently ignore it), so fail loudly instead.
            full = all(isinstance(src.get(p), dict)
                       and ("weight" in src[p] or "weight_q" in src[p])
                       for p in parts)
            if full:
                dst.pop(fused)
            else:
                raise ValueError(
                    f"checkpoint updates {named} but the model's weights are "
                    f"fused into {fused!r}, which holds the only copy of the "
                    f"other projections; the update cannot take effect. Load "
                    f"the checkpoint before quantize/fuse, or save one "
                    f"carrying base weights for all of {list(parts)}.")
        for k, v in src.items():
            if k in dst:
                dst[k] = _merge(dst[k], v)
            else:
                dst[k] = v
        return dst
    if isinstance(src, list) and isinstance(dst, list):
        for i, v in enumerate(src):
            if i < len(dst):
                dst[i] = _merge(dst[i], v)
            else:
                dst.append(v)
        return dst
    return src


def params_to_reference_flat(params: Dict[str, Any]) -> Dict[str, Any]:
    """Params pytree -> flat dict with the reference's per-layer names.

    The in-memory layout already uses per-layer lists (measured: separate
    per-layer weight arrays decode ~1.7x faster than lax.scan over stacked
    arrays on v5e), so this is a plain flatten."""
    return tree_to_flat(params)


def save_csm_weights(path: str, params: Dict[str, Any]) -> None:
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v) for k, v in params_to_reference_flat(params).items()}
    save_file(flat, path)


def resolve_weight_path(model_or_path: str, filename: Optional[str] = None) -> str:
    """Local path, or HF repo id trying the reference's candidate filenames
    (cli/generate.py:19-49).

    An EXPLICIT `filename` that is absent raises rather than falling back
    to the default candidates: silently serving `mlx-ckpt.safetensors`
    when the caller asked for e.g. `step_500/latest.safetensors` would load
    the base model in place of the fine-tune (the reference likewise raises
    on a missing explicit path, cli/generate.py:33-36)."""
    if os.path.exists(model_or_path):
        if os.path.isdir(model_or_path):
            if filename:
                p = os.path.join(model_or_path, filename)
                if not os.path.exists(p):
                    raise FileNotFoundError(
                        f"Requested checkpoint {filename!r} not found in "
                        f"{model_or_path}")
                return p
            for cand in WEIGHT_FILE_CANDIDATES:
                p = os.path.join(model_or_path, cand)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(
                f"No checkpoint ({WEIGHT_FILE_CANDIDATES}) in {model_or_path}"
            )
        return model_or_path
    from huggingface_hub import hf_hub_download

    last_err: Exception | None = None
    for cand in ((filename,) if filename else WEIGHT_FILE_CANDIDATES):
        try:
            return hf_hub_download(repo_id=model_or_path, filename=cand)
        except Exception as e:  # noqa: PERF203
            last_err = e
    raise FileNotFoundError(
        f"Could not resolve weights from {model_or_path}: {last_err}"
    )
