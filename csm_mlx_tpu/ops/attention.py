"""Grouped-query attention for TPU.

Replaces the reference's fused Metal SDPA + `mx.repeat` GQA expansion
(`/root/reference/csm_mlx/attention.py:242-249`). Instead of materializing
repeated K/V heads, queries are reshaped to (B, n_kv, group, S, D) and the
contraction is expressed with einsum so XLA maps it straight onto the MXU
without the copy.

Softmax runs in fp32 regardless of the compute dtype (bf16-safe), masked
positions get a large negative bias. All mask builders produce additive fp32
biases so they fuse into the logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask_bias(q_len: int, k_len: int, q_offset: int | jax.Array = 0) -> jax.Array:
    """(q_len, k_len) additive fp32 bias; query i attends keys <= i+offset."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + q_offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return jnp.where(k_pos <= q_pos, 0.0, NEG_INF).astype(jnp.float32)


def key_validity_bias(valid: jax.Array) -> jax.Array:
    """(..., k_len) boolean key validity -> additive bias (..., 1, k_len)."""
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[..., None, :]


def flash_prefill_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    pad_len: jax.Array,
) -> jax.Array:
    """Prefill attention as a Pallas kernel: causal + left-pad masking
    computed in-register, logits never materialized in HBM.

    The einsum path writes (B, H, S, S) fp32 logits+probs through HBM —
    ~570 MB for a 2048-token prompt; this kernel streams K/V per kv-head
    into VMEM and keeps each (group*BLK_Q, S) logits tile on-chip. This is
    the TPU equivalent of the reference's fused Metal SDPA prefill
    (/root/reference/csm_mlx/attention.py:247-249).

    Args:
      q: (B, n_heads, S, D) — S = prompt bucket; must be a multiple of the
        128-row query block past S=128 (the grid writes whole blocks; a
        ragged tail block would be left uninitialized — enforced below).
      k, v: (B, n_kv, S, D) — the prompt's keys/values (cache[:, :, :S]).
      pad_len: (B,) int32 left-padding; query i attends key j iff
        pad_len[b] <= j <= i.

    Returns (B, n_heads, S, D) in q.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_heads, s, d = q.shape
    n_kv = k.shape[1]
    group = n_heads // n_kv
    blk_q = min(128, s)
    if s % blk_q:
        # The grid emits s // blk_q full query blocks: a non-multiple S
        # would silently return garbage for the last s % blk_q rows —
        # including the final position, whose hidden state drives sampling.
        raise ValueError(
            f"flash_prefill_sdpa needs S divisible by {blk_q}, got {s}")
    q5 = q.reshape(b, n_kv, group, s, d)

    def kernel(pad_ref, q_ref, k_ref, v_ref, o_ref):
        qb = pl.program_id(2)
        qt = q_ref[0, 0].reshape(group * blk_q, d).astype(jnp.float32)
        kt = k_ref[0, 0].astype(jnp.float32)  # (S, D)
        logits = jax.lax.dot_general(
            qt, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (group*blk_q, S)
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (group * blk_q, s), 0)
        q_pos = jax.lax.rem(q_idx, blk_q) + qb * blk_q
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (group * blk_q, s), 1)
        # pad_ref holds the WHOLE (B,) vector in SMEM (Mosaic rejects a
        # (1,)-block of a rank-1 array unless B is 128-aligned — hit by
        # the continuous engine's padded 16-wide admits at bucket 512);
        # index the batch row directly.
        ok = (k_pos <= q_pos) & (k_pos >= pad_ref[pl.program_id(0)])
        logits = jnp.where(ok, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = out.reshape(group, blk_q, d).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_kv, s // blk_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # whole (B,) pad vector
            pl.BlockSpec((1, 1, group, blk_q, d),
                         lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, group, blk_q, d),
                               lambda bi, hi, qi: (bi, hi, 0, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, s, d), q.dtype),
        interpret=(jax.default_backend() == "cpu"),
    )(jnp.asarray(pad_len, jnp.int32).reshape(b), q5, k, v)
    return out.reshape(b, n_heads, s, d)


def kv_prefix_buckets(capacity: int, min_capacity: int = 1024,
                      start: int = 512, step: int = 256) -> tuple:
    """HOST-side bucket table for bucketed decode attention.

    The KV cache is a static-capacity HBM buffer and the masked-einsum
    decode path reads ALL capacity positions every step; at serving
    shapes the dead tail dominates (continuous engine: capacity 1890
    with ~640 live positions costs ~3 GB/step of KV reads at B=48 —
    more than the backbone weights; benchmarks/micro_backbone_gap.py
    GAP_B=48). The fix is a STATIC prefix length per compiled program
    (`llama_forward(kv_len=...)` slices k/v/mask to the bucket): the
    dispatcher picks `kv_bucket_for(live_end, buckets)` per step block,
    paying one extra compile per bucket its streams ever cross. Masked
    positions contribute exactly 0 to the softmax (exp(NEG_INF) == 0.0
    and they never win the row max), so results differ from the full
    read only in reduction order (ULP-level).

    A traced-length `lax.switch` over prefix slices was tried first and
    measured 1.4x SLOWER than the full read at B=48 x cap 1890 — XLA
    conditionals copy the big K/V operands every step
    (benchmarks/kv_buckets_ab.py). Static buckets are the TPU answer.

    Returns ascending prefix lengths ending at `capacity`; () when the
    buffer is small enough that a full read is already cheap (or
    CSM_TPU_KV_BUCKETS=0).
    """
    import os

    if capacity < min_capacity or \
            os.environ.get("CSM_TPU_KV_BUCKETS", "1") == "0":
        return ()
    buckets = list(range(start, capacity, step))
    buckets.append(capacity)
    return tuple(buckets)


def kv_bucket_for(live_end: int, buckets: tuple) -> int | None:
    """Smallest bucket covering `live_end` valid leading KV positions
    (host-side, per dispatch); None when buckets are disabled."""
    if not buckets:
        return None
    for b in buckets:
        if b >= live_end:
            return b
    return buckets[-1]


def flash_decode_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    pad_len: jax.Array,
    index: jax.Array,
) -> jax.Array:
    """Decode-step attention (S_q == 1) as a Pallas kernel. OPT-IN ONLY —
    measured 1.47x SLOWER than the masked-einsum path at serving shapes.

    Motivation: the einsum decode path showed ~4.7 ms/step of attention
    cost at B=48 (benchmarks/micro_backbone_gap.py `attn` arm, 215 GB/s
    effective). This kernel runs one program per batch row: K/V stream
    into VMEM once, the (group, cap) logits/probs tiles never leave VMEM,
    and the key-validity mask ((pos >= pad_len[b]) & (pos <= index),
    exactly generation._backbone_step's) is computed in-register.

    Verdict (benchmarks/flash_decode_ab.py, interleaved, B=48 cap=768):
    9.50 vs 6.46 ms/step — the per-row (1, n_kv, cap, D) block DMA
    streams below XLA's batched-read rate, and that dominates the fixed
    overhead it removes. Kept for future-hardware re-evaluation behind
    CSM_TPU_FLASH_DECODE=1 (default off; llama._attn_layer).

    Args:
      q: (B, n_heads, 1, D) — the step's rotated queries.
      k, v: (B, n_kv, cap, D) — the full cache buffers (post-write).
      pad_len: (B,) int32 left pads; index: () int32 — the cache's
        pre-advance write position (valid keys are pad <= pos <= index).

    Returns (B, n_heads, 1, D) in q.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_heads, s_q, d = q.shape
    assert s_q == 1, "flash_decode_sdpa is a single-position decode kernel"
    n_kv = k.shape[1]
    cap = k.shape[2]
    group = n_heads // n_kv
    q4 = q.reshape(b, n_kv, group, d)

    def kernel(pad_ref, idx_ref, q_ref, k_ref, v_ref, o_ref):
        bi = pl.program_id(0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 1)
        ok = (pos >= pad_ref[bi]) & (pos <= idx_ref[0])
        for h in range(n_kv):  # static unroll: each kv head's own K/V
            qh = q_ref[0, h].astype(jnp.float32)            # (group, D)
            kh = k_ref[0, h].astype(jnp.float32)            # (cap, D)
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                       # (group, cap)
            logits = jnp.where(ok, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p, v_ref[0, h].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (group, D)
            o_ref[0, h] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # whole (B,) pad vector in SMEM, indexed by program_id — Mosaic
            # rejects rank-1 blocked SMEM specs that aren't 128-multiples
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_kv, group, d), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, cap, d), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, n_kv, cap, d), lambda bi: (bi, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_kv, group, d), lambda bi: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, d), q.dtype),
        interpret=(jax.default_backend() == "cpu"),
    )(jnp.asarray(pad_len, jnp.int32).reshape(b),
      jnp.asarray(index, jnp.int32).reshape(1), q4, k, v)
    return out.reshape(b, n_heads, 1, d)


def tiered_sdpa(
    q: jax.Array,
    k: tuple,
    v: tuple,
    scale: float,
    big_bias: jax.Array,
    j: jax.Array,
) -> jax.Array:
    """Two-tier decode attention (S_q == 1) over [big | recent] K/V.

    The big tier is scan-invariant inside a block-decode program (so XLA
    pipelines its reads at the streaming rate — see
    ops/kv_cache.py::TieredKVCache); the recent tier holds the block's
    K newest positions, of which [0, j] are valid. One softmax runs over
    the concatenated logits, so the valid-logit SET is identical to the
    single-buffer path (ULP-level reduction-order differences only).

    Args:
      q: (B, n_heads, 1, D).
      k, v: ((B, n_kv, cap, D) big, (B, n_kv, K, D) recent) pairs.
      big_bias: additive fp32 bias over the big tier, broadcastable to
        (B, 1, 1, cap) — the caller masks [pad, base) validity.
      j: () int32 — recent positions <= j are valid.

    Returns (B, n_heads, 1, D) in q.dtype.
    """
    kb, kr = k
    vb, vr = v
    b, n_heads, s_q, d = q.shape
    n_kv = kb.shape[1]
    group = n_heads // n_kv
    win = kr.shape[2]
    qg = q.reshape(b, n_kv, group, s_q, d)

    lb = jnp.einsum("bkgqd,bkld->bkgql", qg, kb,
                    preferred_element_type=jnp.float32) * jnp.float32(scale)
    if big_bias.ndim == 4:  # (B, 1|H, S_q, cap)
        lb = lb + big_bias[:, :, None]
    else:
        lb = lb + big_bias
    lr = jnp.einsum("bkgqd,bkld->bkgql", qg, kr,
                    preferred_element_type=jnp.float32) * jnp.float32(scale)
    rpos = jnp.arange(win, dtype=jnp.int32)
    lr = jnp.where(rpos <= j, lr, NEG_INF)
    logits = jnp.concatenate([lb, lr], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    cap = kb.shape[2]
    out = (
        jnp.einsum("bkgql,bkld->bkgqd", probs[..., :cap].astype(vb.dtype),
                   vb, preferred_element_type=jnp.float32)
        + jnp.einsum("bkgql,bkld->bkgqd", probs[..., cap:].astype(vr.dtype),
                     vr, preferred_element_type=jnp.float32)
    )
    return out.reshape(b, n_heads, s_q, d).astype(q.dtype)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask_bias: jax.Array | None = None,
) -> jax.Array:
    """Scaled dot-product attention with implicit GQA.

    Args:
      q: (B, n_heads, S_q, D)
      k, v: (B, n_kv_heads, S_k, D); n_heads % n_kv_heads == 0.
      scale: softmax scale (reference uses head_dim ** -0.5).
      mask_bias: additive fp32 bias broadcastable to (B, 1|n_heads, S_q, S_k).

    Returns (B, n_heads, S_q, D) in q.dtype.
    """
    b, n_heads, s_q, d = q.shape
    n_kv = k.shape[1]
    group = n_heads // n_kv

    qg = q.reshape(b, n_kv, group, s_q, d)
    # logits in fp32 for numerically-stable softmax.
    logits = jnp.einsum(
        "bkgqd,bkld->bkgql", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if mask_bias is not None:
        if mask_bias.ndim == 2:  # (S_q, S_k)
            bias = mask_bias[None, None, None]
        elif mask_bias.ndim == 3:  # (B, S_q, S_k)
            bias = mask_bias[:, None, None]
        elif mask_bias.ndim == 4:  # (B|1, H|1, S_q, S_k), H in {1, n_heads}
            h = mask_bias.shape[1]
            if h == n_heads:
                bm = mask_bias.shape[0]
                bias = mask_bias.reshape(bm, n_kv, group, s_q, -1)
            else:
                bias = mask_bias[:, :, None]  # broadcast over (n_kv, group)
        else:
            bias = mask_bias
        logits = logits + bias
    # TP: pin the softmax intermediates to the kv-head sharding — without
    # this the GSPMD partitioner bounces the (B, n_kv, group, S, S) tensors
    # between batch- and head-sharded layouts ("Involuntary full
    # rematerialization" warnings). No-op without an activation mesh.
    from csm_mlx_tpu.ops.act_sharding import constrain

    logits = constrain(logits, "data", "model", None, None, None)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = constrain(probs, "data", "model", None, None, None)
    out = jnp.einsum(
        "bkgql,bkld->bkgqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, n_heads, s_q, d).astype(q.dtype)
