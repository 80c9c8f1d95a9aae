"""Differentiable causal flash attention (training path).

The masked-einsum `sdpa` materializes (B, n_kv, group, S, S) fp32 logits and
probabilities through HBM — ~2 GB per backbone layer at the reference's own
max window (S=2048, B=4; `/root/reference/csm_mlx/finetune/trainer.py:232-241`
drives exactly this teacher-forced pass). This module provides
`flash_attention`, a `jax.custom_vjp` causal attention whose forward AND
backward are Pallas kernels that keep every (rows, S) logits tile in VMEM.

Design (shaped by Mosaic's layout rules — see benchmarks/micro_mosaic_probe.py
for the catalog of unsupported patterns):

- forward: one grid step per (batch, kv-head, 128-row query block); loads the
  whole K/V (S, D) per step (512 KB each at S=2048 fp32 — VMEM-cheap up to
  S≈4096), computes the softmax in fp32. No logsumexp is saved: the backward
  recomputes softmax stats locally, so the VJP residuals are just (q, k, v).
- backward: ONE kernel on the same grid. Each q-block step recomputes its
  probabilities (keepdims reductions only — Mosaic rejects the classic
  "load the saved LSE and reshape (group, S) -> (group*S, 1)" broadcast as an
  unsupported shape cast), emits its dq block, and *accumulates* dk/dv into
  output blocks whose index map ignores the q-block grid dim: TPU grids run
  sequentially, so the (S, D) dk/dv tiles stay VMEM-resident across the
  q-block loop and flush once per (batch, kv-head) — the standard Pallas
  revisiting-accumulation pattern. delta = rowsum(dO * O) is recomputed
  in-kernel from the recomputed O.

GQA is implicit (queries reshaped to (B, n_kv, group, S, D)), matching
`ops/attention.py::sdpa`. Sequence lengths that are not a multiple of the
128-row block are zero-padded and sliced back; padded keys are causally
unreachable from real queries, and padded query rows carry zero cotangents,
so the result is exact.

Intended for the training forward (fresh cache, pure causal mask — the
dataset right-pads, so causal masking alone is already exact; see
finetune/loss.py). Inference prefill keeps using
`ops/attention.py::flash_prefill_sdpa` (left-pad-aware, no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

BLK = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_to_block(x: jax.Array, axis: int) -> jax.Array:
    s = x.shape[axis]
    pad = (-s) % BLK
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _probs(qt, kt, scale, qb, s):
    """Recompute the causal softmax for one q block. qt: (rows, D) fp32,
    kt: (S, D) fp32. Returns p (rows, S) fp32."""
    rows = qt.shape[0]
    group_rows = rows  # group * BLK
    logits = jax.lax.dot_general(
        qt, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (group_rows, s), 0)
    q_pos = jax.lax.rem(q_idx, BLK) + qb * BLK
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (group_rows, s), 1)
    logits = jnp.where(k_pos <= q_pos, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_impl(q5: jax.Array, k: jax.Array, v: jax.Array, scale: float):
    """q5: (B, n_kv, group, S, D); k/v: (B, n_kv, S, D). S % BLK == 0."""
    from jax.experimental import pallas as pl

    b, n_kv, group, s, d = q5.shape

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = pl.program_id(2)
        qt = q_ref[0, 0].reshape(group * BLK, d).astype(jnp.float32)
        kt = k_ref[0, 0].astype(jnp.float32)
        p = _probs(qt, kt, scale, qb, s)
        out = jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = out.reshape(group, BLK, d).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, n_kv, s // BLK),
        in_specs=[
            pl.BlockSpec((1, 1, group, BLK, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, group, BLK, d),
                               lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, s, d), q5.dtype),
        interpret=_interpret(),
    )(q5, k, v)


# ---------------------------------------------------------------------------
# Backward kernel: dq per q block; dk/dv accumulated across q blocks
# ---------------------------------------------------------------------------


def _bwd_impl(q5, k, v, do5, scale):
    from jax.experimental import pallas as pl

    b, n_kv, group, s, d = q5.shape

    def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        qb = pl.program_id(2)
        qt = q_ref[0, 0].reshape(group * BLK, d).astype(jnp.float32)
        kt = k_ref[0, 0].astype(jnp.float32)
        vt = v_ref[0, 0].astype(jnp.float32)
        dot = do_ref[0, 0].reshape(group * BLK, d).astype(jnp.float32)

        p = _probs(qt, kt, scale, qb, s)  # (rows, S)
        # delta = rowsum(dO * O) with O recomputed from p (keepdims: Mosaic-ok)
        o = jax.lax.dot_general(
            p, vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dot * o, axis=-1, keepdims=True)  # (rows, 1)
        dp = jax.lax.dot_general(
            dot, vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, S)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, 0] = dq.reshape(group, BLK, d).astype(dq_ref.dtype)

        # dk/dv: contract over the q rows of THIS block and accumulate into
        # the VMEM-resident (S, D) tiles (output index ignores qb; the
        # sequential grid revisits the same block until (b, h) changes).
        dk_part = jax.lax.dot_general(
            ds, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, D)
        dv_part = jax.lax.dot_general(
            p, dot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, D)

        @pl.when(qb == 0)
        def _init():
            dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
            dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

        dk_ref[0, 0] += dk_part
        dv_ref[0, 0] += dv_part

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, n_kv, s // BLK),
        in_specs=[
            pl.BlockSpec((1, 1, group, BLK, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, group, BLK, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, group, BLK, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_kv, group, s, d), q5.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(q5, k, v, do5)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_solo(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: float) -> jax.Array:
    """Single-device flash attention (the custom_vjp Pallas pair)."""
    return _flash_fwd(q, k, v, scale)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float) -> jax.Array:
    """Causal GQA attention, differentiable, no (S, S) HBM materialization.

    Args:
      q: (B, n_heads, S, D).
      k, v: (B, n_kv, S, D); n_heads % n_kv == 0.
      scale: softmax scale (head_dim ** -0.5).

    Returns (B, n_heads, S, D) in q.dtype. Query i attends keys j <= i
    (exactly `sdpa(..., causal_mask_bias(S, S))` for a fresh sequence).

    Under an installed activation-sharding mesh (VERDICT r3 item 3) the
    kernels run inside `jax.shard_map`: batch shards over "data" and kv
    heads over "model" when divisible (attention is batch- and head-local,
    so the body needs no collectives; each device holds the full sequence).
    The Pallas pair itself cannot partition under GSPMD — without this
    wrapper, exactly the multi-chip long-sequence runs that most need to
    avoid materializing (B, H, S, S) logits fell back to the einsum path.
    """
    from csm_mlx_tpu.ops.act_sharding import active_axis_names, active_mesh

    mesh = active_mesh()
    if mesh is None:
        return _flash_attention_solo(q, k, v, scale)
    sizes = dict(mesh.shape)
    data_name, model_name = active_axis_names()
    b, _h, _s, _d = q.shape
    n_kv = k.shape[1]
    data = (data_name if sizes.get(data_name, 1) > 1
            and b % sizes[data_name] == 0 else None)
    # Head sharding must align kv-group boundaries: each kv head's query
    # group stays with its K/V shard, so "model" shards the n_kv dim.
    model = (model_name if sizes.get(model_name, 1) > 1
             and n_kv % sizes[model_name] == 0 else None)
    if data is None and model is None:
        return _flash_attention_solo(q, k, v, scale)
    from jax.sharding import PartitionSpec as P

    spec = P(data, model, None, None)
    fn = jax.shard_map(
        lambda a, bb, c: _flash_attention_solo(a, bb, c, scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names={ax for ax in (data, model) if ax is not None},
        check_vma=False)
    return fn(q, k, v)


def _prep(q, k, v):
    b, n_heads, s, d = q.shape
    n_kv = k.shape[1]
    group = n_heads // n_kv
    q5 = _pad_to_block(q.reshape(b, n_kv, group, s, d), 3)
    kp = _pad_to_block(k, 2)
    vp = _pad_to_block(v, 2)
    return q5, kp, vp, (b, n_heads, s, d)


def _flash_fwd(q, k, v, scale):
    q5, kp, vp, (b, n_heads, s, d) = _prep(q, k, v)
    out = _fwd_impl(q5, kp, vp, scale)
    return out.reshape(b, n_heads, -1, d)[:, :, :s]


def _vjp_fwd(q, k, v, scale):
    return _flash_fwd(q, k, v, scale), (q, k, v)


def _vjp_bwd(scale, res, do):
    q, k, v = res
    q5, kp, vp, (b, n_heads, s, d) = _prep(q, k, v)
    n_kv = k.shape[1]
    group = n_heads // n_kv
    do5 = _pad_to_block(do.reshape(b, n_kv, group, s, d), 3)
    dq, dk, dv = _bwd_impl(q5, kp, vp, do5, scale)
    dq = dq.reshape(b, n_heads, -1, d)[:, :, :s].astype(q.dtype)
    dk = dk[:, :, :s].astype(k.dtype)
    dv = dv[:, :, :s].astype(v.dtype)
    return dq, dk, dv


_flash_attention_solo.defvjp(_vjp_fwd, _vjp_bwd)
