"""LoRA / DoRA adapters over parameter pytrees.

The reference wraps nn.Linear modules with mlx_lm tuner classes
(`/root/reference/csm_mlx/finetune/utils.py:16-81`). In the functional
design, an adapted Linear's params dict simply gains `lora_a`/`lora_b`
(and `dora_m` for DoRA) keys; `ops.layers.linear` stays untouched because
the adapted forward lives here and model code calls `linear()` through the
same pytree — so we *wrap the weight*, not the module:

  effective W = W + (alpha/r) * B @ A                     (LoRA)
  effective W = m * (W + (alpha/r) B A) / ||.||_col       (DoRA)

Adaptation is applied by `linear_to_lora_layers(model, config)` which
rewrites matching leaves in-place (keys follow the reference's "attn"
expansion: q/k/v/o + gate/up/down, utils.py:59-68, recursing into backbone
and decoder, utils.py:70-72). The trainable filter for optax masking and
trainable-only checkpoints matches paths ending in lora_a/lora_b/dora_m.

Adapter files keep the reference format: `adapter_config.json` +
`adapters.safetensors` (utils.py:84-108, lora_finetune.py:261-266).

Fusing (`fuse_lora`) folds adapters back into plain weights for inference.
"""

from __future__ import annotations

import json
import math
import re
import types
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.models.csm import CSM

DEFAULT_KEYS = [
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
]

TRAINABLE_RE = re.compile(r"\.(lora_a|lora_b|dora_m)$")


def trainable_filter(path: str) -> bool:
    """Path predicate for optax masking / trainable-only checkpoints."""
    return bool(TRAINABLE_RE.search(path))


def effective_weight(p: Dict[str, jax.Array]) -> jax.Array:
    """Materialize the adapted weight from a (possibly) LoRA/DoRA dict.

    Works for plain (out, in) and stacked (L, out, in) weights — the
    batched matmul broadcasts over leading axes."""
    w0 = p["weight"]
    if "lora_a" not in p:
        return w0
    scale = p["lora_scale"] if "lora_scale" in p else 1.0
    if hasattr(scale, "ndim") and scale.ndim > 0:  # stacked: (L,) -> (L,1,1)
        scale = scale[..., None, None]
    # f32 math, result cast back to the BASE dtype: the f32 lora_scale would
    # otherwise promote a bf16 model's fused weights to f32, doubling the
    # HBM bytes on the streaming-bound decode path.
    delta = p["lora_b"].astype(jnp.float32) @ p["lora_a"].astype(jnp.float32)
    w = w0.astype(jnp.float32) + scale * delta
    if "dora_m" in p:
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = p["dora_m"].astype(jnp.float32)[..., None] * w / jnp.maximum(
            norm, 1e-6)
    return w.astype(w0.dtype)


def _adapt_leaf(p: Dict[str, Any], rank: int, scale: float, dropout: float,
                use_dora: bool, key: jax.Array) -> None:
    w = p["weight"]
    *lead, out_dim, in_dim = w.shape
    dtype = w.dtype
    p["lora_a"] = (
        jax.random.uniform(key, (*lead, rank, in_dim), minval=-1.0, maxval=1.0)
        * (1.0 / math.sqrt(in_dim))
    ).astype(dtype)
    p["lora_b"] = jnp.zeros((*lead, out_dim, rank), dtype=dtype)
    # Stacked leaves need a leading L axis on every tensor in the dict so
    # lax.scan can slice them uniformly.
    p["lora_scale"] = jnp.full(tuple(lead), scale, dtype=jnp.float32) \
        if lead else jnp.asarray(scale, dtype=jnp.float32)
    if use_dora:
        p["dora_m"] = jnp.linalg.norm(
            w.astype(jnp.float32), axis=-1
        ).astype(dtype)
    if dropout and dropout > 0.0:
        # Training-time dropout on the adapter input (mlx_lm LoRALinear
        # semantics, utils.py:32-51): applied by ops.layers.linear when the
        # trainers open a `lora_dropout_rng` scope; identity at inference.
        p["lora_dropout"] = jnp.asarray(dropout, dtype=jnp.float32)


def linear_to_lora_layers(model, config: Dict, use_dora: bool = False) -> None:
    """Convert matching Linears in a CSM (or sub-pytree) to LoRA/DoRA.

    config: {"rank": int, "scale": float, "dropout": float, "keys": [...]}
    — "attn" in keys expands to the reference's q/k/v/o + MLP set
    (utils.py:59-68). `ops.layers.linear` serves adapted dicts directly (it
    dispatches on the `lora_a` key), so conversion is pure data.
    """
    keys = set(config.get("keys") or [])
    if "attn" in keys:
        keys.discard("attn")
        keys.update(DEFAULT_KEYS)
    if not keys:
        keys.update(DEFAULT_KEYS)

    params = model.params if isinstance(model, CSM) else model
    rank = config["rank"]
    scale = config.get("scale", 20.0 / max(rank, 1))
    dropout = config.get("dropout", 0.0)

    rng = jax.random.PRNGKey(config.get("seed", 0))
    counter = [0]
    skipped: List[str] = []
    fused_names = ("self_attn.qkv_proj", "mlp.gateup_proj")
    fused_targets = {"self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "mlp.gate_proj", "mlp.up_proj"}

    def visit(tree, path):
        if isinstance(tree, dict):
            if any(path.endswith(k) for k in keys):
                if "weight" in tree:
                    counter[0] += 1
                    _adapt_leaf(tree, rank, scale, dropout, use_dora,
                                jax.random.fold_in(rng, counter[0]))
                    return
                if "weight_q" in tree:
                    skipped.append(path)  # quantized: no raw weight to adapt
                    return
            if any(path.endswith(f) for f in fused_names) and \
                    keys & fused_targets:
                # fuse_layer_weights renamed the targets away; adapting the
                # fused dict under the old names would silently not happen
                skipped.append(path)
                return
            for k, v in tree.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                visit(v, f"{path}.{i}")

    visit(params, "")
    if skipped or counter[0] == 0:
        # A silent no-op here cascades: load_adapters would then merge
        # lora_a/lora_b into unconverted dicts WITHOUT lora_scale (adapter
        # applied at the wrong scale) or into fused dicts nothing reads.
        detail = f"; quantized/fused targets: {skipped[:4]}" if skipped else ""
        raise ValueError(
            f"linear_to_lora_layers adapted {counter[0]} leaves and found "
            f"{len(skipped)} unadaptable targets{detail} — convert to LoRA "
            f"BEFORE quantize_model/fuse_layer_weights, or pass keys that "
            f"match the current layout")


def fuse_lora(model: CSM) -> None:
    """Fold adapters into plain weights (inference fast path)."""
    def visit(tree):
        if isinstance(tree, dict):
            if "lora_a" in tree:
                tree["weight"] = effective_weight(tree)
                for k in ("lora_a", "lora_b", "lora_scale", "dora_m",
                          "lora_dropout"):
                    tree.pop(k, None)
                return
            for v in tree.values():
                visit(v)
        elif isinstance(tree, list):
            for v in tree:
                visit(v)

    visit(model.params)


def save_adapter_weights(model: CSM, file_path, weight_filter=None) -> None:
    """Write adapters.safetensors (reference-compatible per-layer names,
    utils.py:84-108 format). `weight_filter` defaults to the lora/dora
    trainable filter; the CLI passes a wider one for --train-embeddings."""
    from safetensors.numpy import save_file

    from csm_mlx_tpu.loaders import params_to_reference_flat

    flt = weight_filter or trainable_filter
    flat = params_to_reference_flat(model.params)
    adapters = {k: np.asarray(v) for k, v in flat.items() if flt(k)}
    save_file(adapters, str(file_path))


def save_adapters(model: CSM, adapter_dir: str, config: Dict,
                  fine_tune_type: str = "lora") -> None:
    """Write adapter_config.json + adapters.safetensors
    (lora_finetune.py:261-266, :333-338)."""
    path = Path(adapter_dir)
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "adapter_config.json", "w") as f:
        json.dump({"fine_tune_type": fine_tune_type,
                   "lora_parameters": config}, f, indent=2)
    save_adapter_weights(model, path / "adapters.safetensors")


def load_adapters(model: CSM, adapter_path: str) -> CSM:
    """Re-apply LoRA structure from adapter_config.json and load weights
    (utils.py:84-108)."""
    _adapter_path = Path(adapter_path)
    if not _adapter_path.exists():
        raise FileNotFoundError(
            f"The adapter path does not exist: {_adapter_path}"
        )
    with open(_adapter_path / "adapter_config.json") as fid:
        config = types.SimpleNamespace(**json.load(fid))
    fine_tune_type = getattr(config, "fine_tune_type", "lora")
    if fine_tune_type != "full":
        linear_to_lora_layers(
            model, config.lora_parameters, use_dora=(fine_tune_type == "dora")
        )
    model.load_weights(str(_adapter_path / "adapters.safetensors"),
                       strict=False)
    return model
