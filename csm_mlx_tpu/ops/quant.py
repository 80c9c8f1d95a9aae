"""Quantization: grouped affine (MLX parity) and W8A8/W4A8 MXU paths.

Generation is HBM-bandwidth-bound — the 31-step decoder inner loop re-reads
every decoder weight per frame (SURVEY.md §6) — so weight compression is the
TPU perf lever. Two schemes:

1. Grouped affine (`quantize_weight`, mode="affine"): capability parity with
   the reference's `nn.quantize(model, bits, group_size)` (README.md:92-128,
   defaults 4-bit / group 64). Codes are unsigned (uint8 / native uint4),
   W ~= scales * q + biases per input-group — MLX-quantized checkpoints map
   over losslessly. Served by a Pallas VPU-dequant kernel
   (`_pallas_quant_matvec`), which is VPU-convert-bound (~210 GB/s).

2. Per-channel W8A8/W4A8 (`quantize_weight_w8`, mode="w8a8"/"w4a8"): signed
   codes, activations dynamically quantized to int8, and the matmul runs
   int8 x int8 -> int32 *on the MXU* (`_pallas_quant_matvec_w8a8`) with the
   affine correction applied per output tile — the fastest measured decode
   path (PERFORMANCE.md: RTF 5.0 vs 4.0 bf16). W4A8 works on CPU but the
   current axon TPU runtime mishandles native int4 arrays, so W8A8 is the
   production default.

A pure-XLA dequant fallback keeps CPU/debug paths working everywhere. Note
XLA alone cannot serve this workload: it materializes dequantized weights in
HBM (measured 4x slower than bf16).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_GROUP_SIZE = 64
DEFAULT_BITS = 4


# ---------------------------------------------------------------------------
# Quantize / dequantize (host or device)
# ---------------------------------------------------------------------------


def quantize_weight(
    w: jax.Array, bits: int = DEFAULT_BITS, group_size: int = DEFAULT_GROUP_SIZE
) -> Dict[str, jax.Array]:
    """(out, in) float -> {weight_q, scales, biases, (static) bits/group}."""
    out_dim, in_dim = w.shape
    assert in_dim % group_size == 0, (in_dim, group_size)
    n_groups = in_dim // group_size
    wf = jnp.asarray(w, dtype=jnp.float32).reshape(out_dim, n_groups, group_size)

    w_max = wf.max(axis=-1)
    w_min = wf.min(axis=-1)
    n_levels = (1 << bits) - 1
    scale = (w_max - w_min) / n_levels
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round((wf - w_min[..., None]) / scale[..., None]),
                 0, n_levels).astype(jnp.uint8)
    q = q.reshape(out_dim, in_dim)
    if bits == 4 and jax.default_backend() == "cpu":
        # Native sub-byte dtype: XLA stores uint4 packed (2/byte) in HBM.
        # The axon TPU runtime crashes on native int4 arrays (see
        # PERFORMANCE.md envelope), so on TPU 4-bit codes stay in uint8
        # carriers — same dequant math, byte-per-code footprint.
        q = q.astype(jnp.uint4)
    return {
        "weight_q": q,  # (out, in) uint8 / uint4 codes
        "scales": scale.astype(jnp.float32),
        "biases": w_min.astype(jnp.float32),
    }


def dequantize_weight(qp: Dict[str, jax.Array], bits: int = 0,
                      group_size: int = 0, dtype=jnp.bfloat16) -> jax.Array:
    """The quantized dict is self-describing: `bits`/`group_size` are
    accepted for call-site compatibility but IGNORED — the group count
    derives from the stored scales, and the codes' dtype carries the
    bit width."""
    q = qp["weight_q"].astype(jnp.int32)
    out_dim, in_dim = q.shape
    # Group count comes from the stored scales (handles both grouped affine
    # and per-channel W8A8 layouts).
    n_groups = qp["scales"].shape[-1]
    qf = q.reshape(out_dim, n_groups, in_dim // n_groups).astype(jnp.float32)
    w = qf * qp["scales"][..., None] + qp["biases"][..., None]
    return w.reshape(out_dim, in_dim).astype(dtype)


# ---------------------------------------------------------------------------
# Quantized matmul — Pallas kernel (TPU) with XLA fallback
# ---------------------------------------------------------------------------


def _xla_quant_matmul(x, qp, bits, group_size):
    w = dequantize_weight(qp, bits, group_size, dtype=x.dtype)
    return jnp.einsum("...i,oi->...o", x, w)


def _pallas_quant_matvec(x, weight_q, scales, biases, *, bits, group_size):
    """x: (B, IN); weight_q: (OUT, IN) int8/int4 codes -> (B, OUT).

    Grid over OUT tiles; x is small (decode-time activations) and lives
    fully in VMEM; each program dequantizes its weight tile in-register and
    feeds the MXU. Mosaic constraints shape the implementation: groups are
    dequantized with a per-group loop over 128-aligned lane slices and a
    (tile, 1)->(tile, group) scalar broadcast — no cross-lane reshapes.
    int4 codes use the native jnp.int4 dtype (Mosaic unpacks in-register).
    """
    from jax.experimental import pallas as pl

    b, in_dim = x.shape
    out_dim = weight_q.shape[0]
    n_groups = scales.shape[1]
    assert group_size % 128 == 0, "pallas path requires 128-aligned groups"
    tile_out = 256
    while out_dim % tile_out != 0:
        tile_out //= 2

    def kernel(x_ref, q_ref, s_ref, z_ref, o_ref):
        acc = jnp.zeros((b, tile_out), jnp.float32)
        for g in range(n_groups):
            sl = pl.ds(g * group_size, group_size)
            # No direct sub-byte/uint8 -> f32 cast in Mosaic: widen first.
            qg = q_ref[:, sl].astype(jnp.int32).astype(jnp.float32)
            wg = qg * s_ref[:, g][:, None] + z_ref[:, g][:, None]
            acc += jax.lax.dot_general(
                x_ref[:, sl].astype(jnp.float32), wg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[...] = acc.astype(o_ref.dtype)

    grid = (out_dim // tile_out,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, in_dim), lambda i: (0, 0)),
            pl.BlockSpec((tile_out, in_dim), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, n_groups), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, n_groups), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), x.dtype),
        interpret=(jax.default_backend() == "cpu"),
    )(x, weight_q, scales, biases)


def _pallas_quant_matvec_w8a8(x, weight_q, scales, biases, *, bits,
                              group_size):
    """W8A8 variant: activations are dynamically quantized to int8 and the
    dot runs int8 x int8 -> int32 on the MXU — no VPU dequant of the weight
    tile at all, so the kernel streams codes at full HBM rate.

    Requires per-channel (group_size == in_dim) affine weights:
      w[o,i] = s[o] * q[o,i] + z[o]
      out[o] = s[o]/xs * P[o] + z[o] * xsum,  P = sum_i qx[i] q[o,i]
    where qx = round(x * xs), xs = 127 / max|x|.
    """
    from jax.experimental import pallas as pl

    b, in_dim = x.shape
    out_dim = weight_q.shape[0]
    assert scales.shape[1] == 1, "w8a8 path needs per-channel scales"
    # Each grid step costs ~8 us regardless of tile size (PERFORMANCE.md
    # round-2 envelope), so blocks aim for ~4 MB of codes: wide fused
    # matmuls (gate-up 16384 rows) run 8 grid steps instead of 32.
    tile_out = 4096
    while tile_out > 256 and (out_dim % tile_out != 0
                              or tile_out * in_dim > (4 << 20)):
        tile_out //= 2
    while out_dim % tile_out != 0:
        tile_out //= 2

    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
    xs = 127.0 / absmax
    xq = jnp.clip(jnp.round(xf * xs), -127, 127).astype(jnp.int8)
    xsum = jnp.sum(xf, axis=-1, keepdims=True)  # (B, 1)

    def kernel(xq_ref, aux_ref, q_ref, s_ref, z_ref, o_ref):
        # intN x int8 -> int32 directly on the MXU (operands stay narrow;
        # Mosaic rejects pre-widened i32 dot inputs). int4 codes are widened
        # to int8 in-register (W4A8): HBM traffic halves again.
        q = q_ref[...]
        if q.dtype != jnp.int8:
            q = q.astype(jnp.int8)
        p = jax.lax.dot_general(
            xq_ref[...], q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, tile)
        inv_xs = aux_ref[...][:, 0:1]   # (B, 1)
        xsum_v = aux_ref[...][:, 1:2]   # (B, 1)
        s_row = s_ref[...]              # (1, tile)
        z_row = z_ref[...]
        o_ref[...] = (
            p.astype(jnp.float32) * s_row * inv_xs + z_row * xsum_v
        ).astype(o_ref.dtype)

    aux = jnp.concatenate([1.0 / xs, xsum], axis=-1)  # (B, 2)
    # Row-vector layout so the kernel broadcasts without transposing.
    s_rowv = scales.reshape(1, out_dim)
    z_rowv = biases.reshape(1, out_dim)
    grid = (out_dim // tile_out,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, in_dim), lambda i: (0, 0)),
            pl.BlockSpec((b, 2), lambda i: (0, 0)),
            pl.BlockSpec((tile_out, in_dim), lambda i: (i, 0)),
            pl.BlockSpec((1, tile_out), lambda i: (0, i)),
            pl.BlockSpec((1, tile_out), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), x.dtype),
        interpret=(jax.default_backend() == "cpu"),
    )(xq, aux, weight_q, s_rowv, z_rowv)


def _xla_w8a8_matvec(x, weight_q, scales, biases):
    """Exact XLA mirror of `_pallas_quant_matvec_w8a8`'s arithmetic: dynamic
    per-row int8 activation quant, int8 x int8 -> int32 dot, per-channel
    affine fixup. Serves (a) the CPU decode path for W8A8 dicts — so the
    virtual-mesh tests exercise the TPU kernel's *semantics*, not the
    higher-precision dequant einsum — and (b) shard_map shards whose
    geometry fails the Pallas kernel's 128-alignment gate."""
    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / absmax)), -127, 127).astype(
        jnp.int8)
    p = jax.lax.dot_general(
        xq, weight_q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_dim = weight_q.shape[0]
    return (p.astype(jnp.float32) * scales.reshape(1, out_dim)
            * (absmax / 127.0)
            + biases.reshape(1, out_dim)
            * jnp.sum(xf, axis=-1, keepdims=True)).astype(x.dtype)


def _w8a8_local(xf, wq, s, z):
    """One device's W8A8 matvec: the Pallas MXU kernel when the local shard
    is 128-aligned on a TPU, the exact XLA mirror otherwise (CPU tests,
    odd shards)."""
    out_dim, in_dim = wq.shape
    if (out_dim % 128 == 0 and in_dim % 128 == 0
            and jax.default_backend() != "cpu"):
        return _pallas_quant_matvec_w8a8(xf, wq, s, z, bits=8,
                                         group_size=in_dim)
    return _xla_w8a8_matvec(xf, wq, s, z)


def _quant_linear_tp(params: Dict[str, Any], xf: jax.Array, tp: str,
                     mesh) -> jax.Array:
    """W8A8 linear with the weight sharded over the mesh's "model" axis,
    via `jax.shard_map` (manual over "model" only — the batch axis stays
    under GSPMD, so TP composes with data sharding). VERDICT r3 item 2:
    this is what lets quantized serving run multi-chip at all — the Pallas
    kernel itself does not partition under GSPMD.

    tp="out" (qkv/gate/up/vocab heads): output channels shard; every device
    runs the full small-batch kernel on its channel shard with the full
    activation row, and the shards concatenate. Bit-exact vs solo (the
    per-channel arithmetic is untouched).

    tp="in" (o_proj/down_proj): input dim shards. The dynamic activation
    quant runs OUTSIDE the shard_map on the replicated row (bit-identical
    to solo), each device contracts its int8 shard to a raw int32 partial,
    the partials all-reduce in int32 (exact — integer psum is
    order-independent), and the affine fixup applies once after. Matches
    the XLA mirror's arithmetic exactly; on TPU the solo path runs the
    Pallas kernel whose affine fixup can differ at ULP level (same class
    as the documented resident-vs-dispatched fp noise).
    """
    from jax.sharding import PartitionSpec as P

    wq, s, z = params["weight_q"], params["scales"], params["biases"]
    if tp == "out":
        y = jax.shard_map(
            _w8a8_local, mesh=mesh,
            in_specs=(P(), P("model", None), P("model", None),
                      P("model", None)),
            out_specs=P(None, "model"), axis_names={"model"})(xf, wq, s, z)
        return y
    # tp == "in"
    x32 = xf.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6)
    xq = jnp.clip(jnp.round(x32 * (127.0 / absmax)), -127, 127).astype(
        jnp.int8)

    def shard(xq_l, wq_l):
        p_l = jax.lax.dot_general(
            xq_l, wq_l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jax.lax.psum(p_l, "model")

    p = jax.shard_map(
        shard, mesh=mesh, in_specs=(P(None, "model"), P(None, "model")),
        out_specs=P(), axis_names={"model"})(xq, wq)
    out_dim = wq.shape[0]
    return (p.astype(jnp.float32) * s.reshape(1, out_dim) * (absmax / 127.0)
            + z.reshape(1, out_dim)
            * jnp.sum(x32, axis=-1, keepdims=True)).astype(xf.dtype)


def _tp_engages(tp: Optional[str], params: Dict[str, Any], is_w8a8: bool,
                mesh) -> bool:
    """The shard_map path applies when a mesh with model>1 is installed,
    the dict is plain W8A8 (no LoRA riding on top — the adapter delta is
    added by the caller on the full output), and the sharded dim divides
    the axis."""
    if tp is None or not is_w8a8 or mesh is None:
        return False
    n = dict(mesh.shape).get("model", 1)
    if n <= 1:
        return False
    out_dim, in_dim = params["weight_q"].shape
    dim = out_dim if tp == "out" else in_dim
    return dim % n == 0


def quantize_weight_w8(w: jax.Array, bits: int = 8) -> Dict[str, jax.Array]:
    """Per-channel affine int8/int4 codes (for the W8A8/W4A8 MXU path).

    Stored as signed codes with w = s*q + z, z = row midpoint; int4 uses the
    native jnp.int4 dtype (0.5 byte/element in HBM)."""
    out_dim, in_dim = w.shape
    wf = jnp.asarray(w, jnp.float32)
    w_max = wf.max(axis=-1, keepdims=True)
    w_min = wf.min(axis=-1, keepdims=True)
    z = (w_max + w_min) / 2.0
    lim = 127 if bits == 8 else 7
    s = jnp.maximum((w_max - w_min) / (2 * lim), 1e-12)
    q = jnp.clip(jnp.round((wf - z) / s), -lim, lim)
    # Native int4 crashes the axon TPU runtime (PERFORMANCE.md envelope):
    # 4-bit codes ride int8 carriers off-CPU (same kernel math).
    use_int4 = bits == 4 and jax.default_backend() == "cpu"
    q = q.astype(jnp.int4 if use_int4 else jnp.int8)
    return {"weight_q": q, "scales": s, "biases": z}


def quantize_audio_head(audio_head: jax.Array) -> Dict[str, jax.Array]:
    """Quantize the (K-1, D, V) audio_head tensor for the W8A8 matvec path.

    Stored transposed as (K-1, V_pad, D) per-output-channel int8 (the matvec
    orientation), with V padded to a multiple of 128 so the Pallas kernel's
    alignment requirement holds; `audio_head_logits` slices the pad off.
    """
    n_heads, d, v = audio_head.shape
    v_pad = -(-v // 128) * 128
    wt = jnp.swapaxes(jnp.asarray(audio_head, jnp.float32), 1, 2)  # (K-1,V,D)
    wt = jnp.pad(wt, ((0, 0), (0, v_pad - v), (0, 0)))
    return jax.jit(jax.vmap(functools.partial(quantize_weight_w8,
                                              bits=8)))(wt)


def audio_head_logits(head, i: int, hidden: jax.Array,
                      n_vocab: int) -> jax.Array:
    """logits for codebook i+1: hidden (B, Dd) x audio_head[i] -> (B, V).

    `head` is either the raw (K-1, D, V) tensor (bf16 einsum, fp32 accum) or
    the quantized dict from quantize_audio_head (Pallas W8A8 matvec over the
    128-padded vocab; the pad is sliced off here — `n_vocab` is static).
    """
    if isinstance(head, dict):
        y = quant_linear(
            {"weight_q": head["weight_q"][i], "scales": head["scales"][i],
             "biases": head["biases"][i]},
            hidden,
        ).astype(jnp.float32)
        return y[:, :n_vocab]
    return jnp.einsum("bd,dv->bv", hidden.astype(jnp.float32),
                      head[i].astype(jnp.float32))


def quant_linear(params: Dict[str, Any], x: jax.Array,
                 use_pallas: bool = True,
                 tp: Optional[str] = None) -> jax.Array:
    """Linear over a quantized param dict ({"weight_q","scales","biases"}).

    bits/group_size are inferred from the stored arrays (code dtype and the
    scales' group count), so quantized dicts are self-describing and
    `ops.layers.linear` can dispatch with no side-channel metadata.

    `tp` ("out"/"in"/None) is the caller's tensor-parallel layout hint:
    under an installed activation-sharding mesh with model>1, W8A8 decode
    matvecs run through `_quant_linear_tp` (shard_map over "model") —
    the Pallas kernel itself does not partition under GSPMD.
    """
    q_dtype = params["weight_q"].dtype
    bits = 4 if q_dtype in (jnp.uint4, jnp.int4) else 8
    lead = x.shape[:-1]
    in_dim = x.shape[-1]
    group_size = in_dim // params["scales"].shape[-1]
    xf = x.reshape(-1, in_dim)
    out_dim = params["scales"].shape[0]
    small_batch = xf.shape[0] <= 64
    is_w8a8 = params["weight_q"].dtype in (jnp.int8, jnp.int4)  # signed =>
    # per-channel W8A8 / W4A8 MXU path
    # The affine VPU kernel needs lane-aligned groups; MLX-parity group 64
    # takes the (correct, slower) XLA dequant fallback.
    aligned = out_dim % 128 == 0 and in_dim % 128 == 0 and \
        (is_w8a8 or group_size % 128 == 0)
    if os.environ.get("CSM_TPU_QUANT_PALLAS", "1") == "0":
        use_pallas = False
    mesh = None
    if use_pallas and small_batch and is_w8a8 and bits == 8:
        from csm_mlx_tpu.ops.act_sharding import active_mesh

        mesh = active_mesh()
    if mesh is not None and _tp_engages(tp, params, is_w8a8 and bits == 8,
                                        mesh):
        y = _quant_linear_tp(params, xf, tp, mesh)
    elif use_pallas and small_batch and aligned \
            and jax.default_backend() != "cpu":
        if is_w8a8:
            y = _pallas_quant_matvec_w8a8(
                xf, params["weight_q"], params["scales"], params["biases"],
                bits=8, group_size=in_dim,
            )
        else:
            y = _pallas_quant_matvec(
                xf, params["weight_q"], params["scales"], params["biases"],
                bits=bits, group_size=group_size,
            )
    elif use_pallas and is_w8a8 and bits == 8:
        # Everything else W8A8 runs the exact XLA arithmetic mirror of the
        # TPU kernel: (a) the CPU decode path — virtual-mesh tests then
        # compare the same W8A8 semantics solo and sharded; (b) LARGE-batch
        # rows (Mimi codec transformer at B*S ~ 768, dispatched decode past
        # the small-batch gate) — int8 x int8 -> int32 XLA dots on the MXU
        # instead of materializing a dequantized f32 weight (4x slower,
        # round-1 envelope), and the quantization semantics stop depending
        # on the batch size. use_pallas=False keeps the dequant einsum as
        # an explicit reference path.
        y = _xla_w8a8_matvec(xf, params["weight_q"], params["scales"],
                             params["biases"])
    else:
        y = _xla_quant_matmul(xf, params, bits, group_size)
    y = y.reshape(*lead, -1)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Model quantization API (parity with nn.quantize)
# ---------------------------------------------------------------------------

_NO_QUANT = ("layernorm", "norm", "embeddings", "layer_scale", "codebook")


@functools.lru_cache(maxsize=64)
def _jitted_quantizer(mode: str, bits: int, group_size: int):
    """One jitted program per (mode, bits, group, shape): quantizing a model
    eagerly costs hundreds of tiny dispatches (expensive through the axon
    tunnel); jitting collapses each weight to a single call."""
    if mode in ("w8a8", "w4a8"):
        return jax.jit(functools.partial(
            quantize_weight_w8, bits=4 if mode == "w4a8" else 8))
    return jax.jit(functools.partial(
        quantize_weight, bits=bits, group_size=group_size))


def _quantize_tree(tree: Any, bits: int, group_size: int,
                   predicate, path: str = "", mode: str = "affine") -> Any:
    if isinstance(tree, dict):
        # "codebook" guards RVQ codebooks, not the codebook0_head Linear.
        blocked = any(t in path for t in _NO_QUANT) \
            and "codebook0_head" not in path
        if "dora_m" in tree:
            import warnings

            warnings.warn(
                f"quantize_model: skipping DoRA-adapted '{path}' — the "
                f"per-row renormalization needs the dense weight."
            )
            return tree
        if "weight" in tree and hasattr(tree["weight"], "ndim") and \
                tree["weight"].ndim == 2 and not blocked:
            w = tree["weight"]
            # w8a8/w4a8 are per-channel: no input-group alignment needed.
            align = 1 if mode in ("w8a8", "w4a8") else group_size
            if predicate(w) and w.shape[-1] % align == 0:
                qp = _jitted_quantizer(mode, bits, group_size)(w)
                new = {k: v for k, v in tree.items() if k != "weight"}
                new.update(qp)
                return new
            if predicate(w):  # large enough but misaligned: say so
                import warnings

                warnings.warn(
                    f"quantize_model: skipping '{path}' — in_dim "
                    f"{w.shape[-1]} is not a multiple of group_size "
                    f"{align}; weight stays {w.dtype}."
                )
            return tree
        return {k: _quantize_tree(v, bits, group_size, predicate,
                                  f"{path}.{k}", mode)
                for k, v in tree.items()}
    if isinstance(tree, list):
        return [_quantize_tree(v, bits, group_size, predicate,
                               f"{path}.{i}", mode)
                for i, v in enumerate(tree)]
    return tree


def quantize_model(model, bits: int = DEFAULT_BITS,
                   group_size: int = DEFAULT_GROUP_SIZE,
                   min_size: int = 1 << 16,
                   mode: str = "affine",
                   targets=("backbone", "decoder", "projection"),
                   fuse: bool = True) -> None:
    """Quantize large Linear weights in model.params in place.

    mode="affine": MLX-parity grouped affine codes (uint8/uint4), VPU-dequant
    Pallas kernel. Mirrors `nn.quantize(model, bits=..., group_size=...)`
    (README.md:111).

    mode="w8a8": per-channel signed-int8 weights + dynamic int8 activations;
    the matmul runs int8 x int8 on the MXU (fastest decode path on v5e; see
    benchmarks/micro_matvec.py). `bits`/`group_size` are ignored.

    `targets` picks the components; the decoder + projection dominate decode
    HBM traffic (the 31-step inner loop re-reads them per frame, SURVEY.md
    §6), so ("decoder", "projection") alone captures most of the win at a
    fraction of the (remote-Mosaic) compile cost. Embeddings and norms are
    never quantized (their reads are row-gathers, not matmuls), and
    `codebook0_head` is OFF by default: its 2051-row output dim fails the
    Pallas kernel's 128-alignment gate, so quantizing it only buys the XLA
    dequant fallback's extra HBM traffic plus quantization error — the
    bf16 head is both faster and exact. (audio_head solves this by padding
    the vocab, see quantize_audio_head.)

    Quantized dicts are served directly by `ops.layers.linear`, which
    dispatches on the presence of `weight_q` — no patching or registration.

    On TPU, w8a8+fuse additionally derives the VMEM-resident frame-kernel
    tables (`params["_resident"]`, see ops/resident_decoder.py): batch ≤ 8
    generation then runs each decoder frame as a single Pallas call with
    all decoder weights resident in VMEM (RTF 10.9 → 17.8 single-stream,
    72× → 151× aggregate at batch 8). `CSM_TPU_RESIDENT_DECODER=0` opts out.
    """

    def predicate(w) -> bool:
        return w.size >= min_size

    p = model.params
    for key in targets:
        if key == "audio_head" and key in p and not isinstance(p[key], dict):
            if mode in ("w8a8", "w4a8"):
                p[key] = quantize_audio_head(p[key])
            continue
        if key in p:
            p[key] = _quantize_tree(p[key], bits, group_size, predicate,
                                    path=key, mode=mode)
    if fuse:
        # Fold q/k/v and gate/up into single wide matmuls (decode matvecs
        # are fixed-cost-per-call bound; see models.llama.fuse_layer_weights).
        from csm_mlx_tpu.models.llama import fuse_layer_weights

        for key in ("backbone", "decoder"):
            if key in p:
                fuse_layer_weights(p[key])

    # Derive the VMEM-resident frame-kernel tables (TPU, W8A8+fused only):
    # B=1 generation then runs the whole decoder frame in one pallas_call
    # (ops/resident_decoder.py). No-op when the layout doesn't match.
    if (mode == "w8a8" and fuse and "decoder" in targets
            and jax.default_backend() != "cpu"
            and os.environ.get("CSM_TPU_RESIDENT_DECODER", "1") != "0"):
        from csm_mlx_tpu.ops.resident_decoder import prepare_resident_decoder

        prepare_resident_decoder(model)
