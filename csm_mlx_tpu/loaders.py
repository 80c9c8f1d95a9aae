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
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy()
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
    tree = flat_to_tree(
        {k: jnp.asarray(v, dtype=dtype) for k, v in flat.items()}
    )
    if strict:
        required = ("backbone", "decoder", "text_embeddings", "audio_embeddings",
                    "projection", "codebook0_head", "audio_head")
        missing = [k for k in required if k not in tree]
        if missing:
            raise ValueError(f"Checkpoint {path} missing components: {missing}")
        return tree
    merged = dict(existing or {})
    _merge(merged, tree)
    # Derived "_"-prefixed caches (e.g. the "_resident" frame-kernel tables)
    # snapshot the weights they were built from; a partial load would leave
    # them serving STALE weights while the dispatched path uses the new ones
    # (trainer.__init__ and parallel.shard_model drop them for the same
    # reason). Re-derive via quantize_model/prepare_resident_decoder.
    for k in [k for k in merged if isinstance(k, str) and k.startswith("_")]:
        del merged[k]
    return merged


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
        if any(k in src for k in ("q_proj", "k_proj", "v_proj")) \
                and "qkv_proj" not in src:
            dst.pop("qkv_proj", None)
        if any(k in src for k in ("gate_proj", "up_proj")) \
                and "gateup_proj" not in src:
            dst.pop("gateup_proj", None)
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
    (cli/generate.py:19-49)."""
    if os.path.exists(model_or_path):
        if os.path.isdir(model_or_path):
            for cand in ((filename,) if filename else ()) + WEIGHT_FILE_CANDIDATES:
                p = os.path.join(model_or_path, cand)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(
                f"No checkpoint ({WEIGHT_FILE_CANDIDATES}) in {model_or_path}"
            )
        return model_or_path
    from huggingface_hub import hf_hub_download

    last_err: Exception | None = None
    for cand in ((filename,) if filename else ()) + WEIGHT_FILE_CANDIDATES:
        try:
            return hf_hub_download(repo_id=model_or_path, filename=cand)
        except Exception as e:  # noqa: PERF203
            last_err = e
    raise FileNotFoundError(
        f"Could not resolve weights from {model_or_path}: {last_err}"
    )
