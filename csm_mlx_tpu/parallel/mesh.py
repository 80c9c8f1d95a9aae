"""Device meshes and CSM sharding rules.

Design (How-to-Scale-Your-Model recipe): pick a mesh, annotate shardings on
params and batch, let XLA insert the collectives.

Axes:
- "data": batch dimension — DP fine-tuning and batch-parallel generation.
  Gradients all-reduce over ICI automatically (jit inserts psum when params
  are replicated over "data" and the batch is sharded).
- "model": tensor parallelism — attention heads and MLP hidden dim are
  sharded; o_proj/down_proj contract over the sharded dim so XLA inserts the
  all-reduce at the layer output. Vocab-sharded heads (codebook0/audio_head)
  all-gather only a (B, 2051) logits row.

All rules are expressed as PartitionSpec trees matched to the parameter
pytree by path, so they work under plain jit (shardings attached via
device_put / in_shardings) with no model-code changes.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on a 1-D "data" axis.

    create_mesh({"data": 2, "model": 4}) lays the model axis innermost so
    tensor-parallel collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


# (path regex, spec) — first match wins. Linear weights are (out, in).
_CSM_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: shard heads (out dim of q/k/v, in dim of o). The fused
    # qkv/gateup variants shard the concatenated out dim — GSPMD keeps the
    # math identical (it may insert extra reshard collectives around the
    # q/k/v split; prefer unfused weights for TP).
    (r".*self_attn\.(q_proj|k_proj|v_proj|qkv_proj)\.weight$",
     P("model", None)),
    (r".*self_attn\.o_proj\.weight$", P(None, "model")),
    # mlp: shard hidden dim
    (r".*mlp\.(gate_proj|up_proj|gateup_proj)\.weight$", P("model", None)),
    (r".*mlp\.down_proj\.weight$", P(None, "model")),
    # W8A8 layouts (quantize_model mode="w8a8"): same geometry as the dense
    # rules. Out-sharded projections shard their per-channel scales/biases
    # with the codes; in-sharded (o/down) keep scales/biases replicated —
    # the affine fixup applies once after the int32 all-reduce
    # (ops/quant.py::_quant_linear_tp).
    (r".*self_attn\.(q_proj|k_proj|v_proj|qkv_proj)\."
     r"(weight_q|scales|biases)$", P("model", None)),
    (r".*self_attn\.o_proj\.weight_q$", P(None, "model")),
    (r".*mlp\.(gate_proj|up_proj|gateup_proj)\.(weight_q|scales|biases)$",
     P("model", None)),
    (r".*mlp\.down_proj\.weight_q$", P(None, "model")),
    (r"codebook0_head\.(weight_q|scales|biases)$", P("model", None)),
    # output heads: shard vocab
    (r"codebook0_head\.weight$", P("model", None)),
    (r"audio_head$", P(None, None, "model")),
    # embeddings: shard vocab rows (gathers are cheap row lookups)
    (r"(text|audio)_embeddings\.weight$", P("model", None)),
    # norms, projection, everything else: replicate
    (r".*", P()),
)


def _tree_paths(tree: Any, prefix: str = "") -> Dict[str, Any]:
    # Unlike loaders.tree_to_flat this does NOT skip "_"-prefixed derived
    # entries: the spec tree must be structure-identical to params for
    # jax.tree.map (derived entries fall through to the replicate rule).
    flat: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_tree_paths(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_tree_paths(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = tree
    return flat


def _unflatten_like(tree: Any, flat: Dict[str, Any]) -> Any:
    if isinstance(tree, dict):
        return {k: _unflatten_like(v, {kk[len(k) + 1:]: vv for kk, vv in flat.items()
                                       if kk == k or kk.startswith(k + ".")})
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [
            _unflatten_like(v, {kk[len(str(i)) + 1:]: vv for kk, vv in flat.items()
                                if kk == str(i) or kk.startswith(f"{i}.")})
            for i, v in enumerate(tree)
        ]
        return type(tree)(out) if isinstance(tree, tuple) else out
    return flat[""]


def csm_param_spec(params: Any, tensor_parallel: bool = True) -> Any:
    """PartitionSpec pytree for CSM params (replicated if not TP)."""
    flat = _tree_paths(params)
    rules = _CSM_TP_RULES if tensor_parallel else ((r".*", P()),)
    out = {}
    for path in flat:
        spec = P()
        for pattern, s in rules:
            if re.search(pattern, path):
                spec = s
                break
        out[path] = spec
    return _unflatten_like(params, {k: out[k] for k in flat})


def data_parallel_spec(batch: Any) -> Any:
    """Shard the leading axis of every array leaf over "data"; scalar
    (rank-0) leaves replicate — P("data") on a rank-0 array is invalid."""
    return jax.tree.map(
        lambda x: P() if getattr(x, "ndim", 1) == 0 else P("data"), batch)


# -- FSDP (ZeRO-3-style fully-sharded data parallel) ---------------------
#
# Parameters and optimizer state are *stored* sharded over the "data" axis
# (largest dim of each tensor); XLA's SPMD partitioner inserts the
# all-gather before each use in the forward/backward pass and the
# reduce-scatter on the gradients. The reference has no distributed
# training at all (SURVEY.md §2.3); this is the standard JAX recipe from
# the scaling-book: annotate storage shardings, let GSPMD schedule the
# collectives. Memory per chip drops from O(params) to O(params / n_data)
# for params, grads, and Adam moments alike.

_FSDP_MIN_BYTES = 1 << 16  # replicate small tensors (norm scales, biases)


def fsdp_leaf_spec(x: Any, mesh: Mesh, axis: str = "data") -> P:
    """Shape-based FSDP rule for ONE array: shard the largest dim that
    divides the mesh axis; replicate small/indivisible tensors.

    Shape-based (not path-based) so the same rule applied to a param and
    to its Adam moments yields identical shardings.
    """
    ndim = getattr(x, "ndim", 0)
    size = int(np.prod(x.shape)) if ndim else 1
    nbytes = size * getattr(getattr(x, "dtype", None), "itemsize", 4)
    if ndim == 0 or nbytes < _FSDP_MIN_BYTES:
        return P()
    n = mesh.shape.get(axis, 1)
    # largest dim first; ties broken toward the leading dim
    for dim in sorted(range(ndim), key=lambda d: (-x.shape[d], d)):
        if x.shape[dim] % n == 0:
            return P(*(axis if d == dim else None for d in range(ndim)))
    return P()


def fsdp_param_spec(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """PartitionSpec pytree applying `fsdp_leaf_spec` to every leaf."""
    return jax.tree.map(lambda x: fsdp_leaf_spec(x, mesh, axis), params)


def shard_params_fsdp(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put params (or optimizer state — any pytree of arrays) with
    FSDP storage shardings over `axis`."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_leaf_spec(x, mesh, axis))),
        params,
    )


def _spec_fits(x, spec: P, mesh: Mesh) -> bool:
    """True iff every sharded dim of x divides the mesh axes assigned to it
    AND every named axis exists in the mesh — NamedSharding rejects both
    uneven shards and mesh-absent axes (e.g. TP specs on a pure-data mesh
    must fall back to replication, not raise)."""
    sizes = dict(mesh.shape)
    for dim, axes in enumerate(spec):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else tuple(axes)
        if any(a not in sizes for a in axes):
            return False
        div = 1
        for a in axes:
            div *= sizes[a]
        if dim >= getattr(x, "ndim", 0) or x.shape[dim] % div != 0:
            return False
    return True


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """device_put params with NamedShardings from the rules.

    Tensors whose sharded dims don't divide the mesh axis (e.g. the
    2051-wide vocab heads on a model axis of 4) fall back to replication —
    an odd vocab must not make tensor parallelism unusable."""
    specs = csm_param_spec(params, tensor_parallel)
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, s if _spec_fits(x, s, mesh) else P())),
        params, specs,
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )


def shard_model(model: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """Place a CSM's params on `mesh` (TP rules over "model", replicated
    over "data") in place. After this, `generate`/`generate_batch` accept
    `mesh=` to shard the batch axis; jit propagates the weight shardings and
    XLA inserts the collectives.

    Tensor-parallel rules cover both the bf16 layout and quantize_model's
    W8A8 layout (weight_q/scales/biases) — quantized decode matvecs then
    run per-shard through shard_map (ops/quant.py::_quant_linear_tp; the
    Pallas kernel itself is a single-device program GSPMD cannot
    partition). Fused qkv/gateup weights shard on the concatenated out
    dim; GSPMD inserts reshards around the q/k/v split, so unfused
    weights reshard less under TP.

    Derived "_"-prefixed param entries (e.g. the "_resident" frame-kernel
    tables, which assume a single-device decoder) are dropped: sharded
    generation uses the dispatched decode path.
    """
    if isinstance(model.params, dict):
        for k in [k for k in model.params if isinstance(k, str)
                  and k.startswith("_")]:
            del model.params[k]
    model.params = shard_params(model.params, mesh, tensor_parallel)
    return model
