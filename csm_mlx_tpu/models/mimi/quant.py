"""W8A8 quantization for the Mimi DECODE path (serving Mimi term).

The 48-slot continuous engine spends ~17 ms of its 70 ms step block in the
f32 Mimi block decode (PERFORMANCE.md round-3 decomposition: SEANet convs
6.0 ms, codec transformer 3.5, RVQ 1.0, upsample 0.9 + non-pipelined
overhead). bf16 was measured and rejected (~2% end-to-end); this module
takes the convs to int8 on the MXU instead:

- SEANet decoder convs (init / residual / final / transposed upsamplers):
  SYMMETRIC per-out-channel int8 weights (w ~ s_o * q). Symmetric (not
  affine) so the zero-point correction term — a second conv of the
  activations with an all-ones kernel — never exists; audio conv weights
  are near-symmetric so the quality cost is the same order as affine.
  Activations quantize dynamically per batch row (one scalar over (C, T)
  of the chunk — the reduction window must share one scale), the conv runs
  int8 x int8 -> int32 on the MXU (`lax.conv_general_dilated` with
  `preferred_element_type=int32`), and the per-channel fixup multiplies
  s_o * absmax/127.
- the codec transformer's linears (q/k/v/o/fc1/fc2): per-channel affine
  int8 via the shared `quantize_weight_w8`; `ops.layers.linear` dispatches
  quantized dicts transparently (at the engine's B*S it takes the XLA
  int8-dot mirror, not the small-batch Pallas matvec).

The upsample convtr (groups == channels) and RVQ embedding sums stay f32:
both are ~1 ms, channelwise/gather-bound, and int8 buys nothing there.

Parity: quantization error only (no arithmetic shortcuts) — gated by
tests/test_mimi_quant.py against the f32 decode and by the on-TPU A/B
`benchmarks/micro_mimi_decode.py MIMI_QUANT_AB=1` (measured NEGATIVE on
this chip: int8 SEANet convs 1.36× slower than f32 — the path ships
opt-in as a hedge for hardware where XLA's int8 convs pay). The ENCODE
path is never quantized: prompt/context encodes feed training and
parity gates.

The reference has no codec quantization at all (its Mimi runs through
moshi_mlx float kernels, /root/reference/csm_mlx/tokenizers.py:14-21);
this is a serving-throughput extension.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _quant_conv_sym(p: Params, out_axis: int) -> Params:
    """Symmetric per-out-channel int8 codes for a conv weight.

    conv1d weights are (C_out, C_in, K) (out_axis=0); transposed-conv
    weights are (C_in, C_out/groups, K) (out_axis=1). `bias` stays f32.
    """
    w = jnp.asarray(p["weight"], jnp.float32)
    red = tuple(i for i in range(w.ndim) if i != out_axis)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=red, keepdims=True) / 127.0,
                    1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"weight_q": q, "scales": s.reshape(-1).astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _walk_seanet_decoder(dec: Params) -> Iterable[tuple]:
    """(container, key, out_axis) for every quantizable decoder conv."""
    yield dec, "init", 0
    for stage in dec["stages"]:
        yield stage, "up", 1            # transposed conv: (C_in, C_out, K)
        for block in stage["residual"]:
            yield block, "conv1", 0
            yield block, "conv2", 0
    yield dec, "final", 0


def quantize_mimi_decoder(mimi, targets=("seanet", "transformer")) -> None:
    """Quantize the decode path of a `Mimi` instance in place.

    `targets`: any of "seanet" (decoder convs -> symmetric W8A8) and
    "transformer" (decoder_transformer linears -> per-channel affine int8).
    Encoder, quantizer, and the grouped upsample are untouched. Idempotent:
    already-quantized leaves are skipped.
    """
    from csm_mlx_tpu.ops.quant import quantize_weight_w8

    params = mimi.params
    if "seanet" in targets:
        for holder, key, out_axis in _walk_seanet_decoder(params["decoder"]):
            if "weight_q" not in holder[key]:
                holder[key] = _quant_conv_sym(holder[key], out_axis)
    if "transformer" in targets:
        for lp in params["decoder_transformer"]["layers"]:
            at, mlp = lp["self_attn"], lp["mlp"]
            for h, k in ((at, "q_proj"), (at, "k_proj"), (at, "v_proj"),
                         (at, "o_proj"), (mlp, "fc1"), (mlp, "fc2")):
                if "weight_q" not in h[k]:
                    bias = h[k].get("bias")
                    h[k] = quantize_weight_w8(h[k]["weight"])
                    if bias is not None:
                        h[k]["bias"] = bias
    # drop cached jitted entry points: they closed over nothing, but the
    # param tree structure changed and donation/layout caches keyed on it
    mimi._decode_step_jit = None


def mimi_decoder_is_quantized(params: Params) -> bool:
    return "weight_q" in params.get("decoder", {}).get("init", {})
