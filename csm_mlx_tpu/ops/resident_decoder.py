"""VMEM-resident whole-frame decoder kernel (the fused decode-step kernel).

The production decoder inner loop (`generation._decode_frame`, mirroring
`/root/reference/csm_mlx/generation.py:70-90`) dispatches ~500 Pallas/XLA
calls per 80 ms frame and re-streams all ~106 MB of int8 decoder weights
from HBM on *every one* of the 31 token-steps (~3.3 GB/frame). This kernel
runs the entire frame — 2-token prime, 30 single-token decoder steps,
per-step audio_head logits and sampling — in ONE `pallas_call`:

- the 4 decoder layers' W8A8 weights are loaded into VMEM once per frame
  (~106 MB, fits v5e's ~128 MB VMEM) and reused by all 31 steps;
- the (31, 1024, V) audio_head is double-buffer streamed from HBM, one
  bf16 slice per step, overlapped with compute;
- the projected audio-embedding row for the sampled token is DMA-gathered
  from a precomputed HBM table between steps;
- RoPE is applied as a per-position 128x128 rotation-matrix matmul (MXU)
  to avoid in-kernel even/odd lane shuffles;
- the 33-slot KV cache lives in VMEM scratch for the whole frame;
- sampling is in-kernel: greedy argmax, or temperature-categorical via
  Gumbel-max over the TPU PRNG (distribution-parity with
  `mx.random.categorical(logits/temp)` at generation.py:81-84).

Measured (benchmarks/micro_resident_decoder.py, long-program methodology):
the resident matvec chain runs 1.6x faster than the dispatched production
chain (2.78 vs 4.48 ms/frame). The path is used automatically for W8A8
generation at batch <= CSM_TPU_RESIDENT_MAX_BATCH (attention is one
block-diagonal matmul over the batch-flattened KV, so the Mosaic program
size no longer grows with b); `CSM_TPU_RESIDENT_DECODER=0` disables it.
Batches past 8 trade the KV scratch to bf16 to stay inside VMEM (weights
keep bit-parity). Measured cost of that economy
(benchmarks/resident_divergence_probe.py, kernel-vs-kernel on random
weights): ~0.35% of greedy picks per step flip vs the B=1 f32-KV stream
(214/240 rows bit-identical over whole frames) — 25x smaller than the
inherent resident-vs-dispatched fp divergence (~9%/step on random
weights; int8 requantization amplifies ULP-level arithmetic differences,
see PERFORMANCE.md "Resident-vs-dispatched numerics").

Codebook 0 stays outside (it is sampled from the backbone hidden state
with the full sampler/logits-processor chain, generation.py:42-54); the
kernel consumes the projected [backbone_hidden, c0_embed] pair and emits
codebooks 1..31.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, FrozenSet

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30

# Round-4 kernel variants (each independently toggleable so the A/B bench
# can interleave arms inside one process; see benchmarks/resident_v2_ab.py):
#
# - "vpu_rope":    RoPE as elementwise VPU math (x*cos + roll(x,-1)*sin_a +
#                  roll(x,+1)*sin_b over a (cap, 3, hd) table) instead of two
#                  (rows, hd)x(hd, hd) rotation-matrix MXU dots per
#                  layer-step. Removes 2*n_layers serial MXU dots per step
#                  (248/frame) and retires the 2 MB rotation-matrix table.
# - "merged_attn": one score + one AV dot per layer-step over the
#                  batch+group-flattened KV ((b*heads, cap*b*n_kv) scores
#                  with an int32 ownership-key mask) instead of a python loop
#                  of 2 dots per kv-group. Auto-enabled at b<=8 only: the
#                  merged score matrix grows the transient VMEM footprint,
#                  which the b=48 configuration (127.15/128 MB) cannot
#                  absorb, and at large b the dots are MXU-compute-bound
#                  anyway (latency is not the bottleneck merging attacks).
# - "dma_weights": the four big int8 weight arrays per layer arrive as ANY
#                  (HBM) refs and are manually DMA'd into VMEM scratch at
#                  kernel entry, with per-layer waits at step 0 — step-0
#                  compute starts once layer 0's ~26 MB lands instead of
#                  after the Pallas prologue copies all ~106 MB.
#
# Measured (benchmarks/resident_v2_ab.py, interleaved, b=1): each variant
# is worth ~1%, all three together ~2.5% — the 31-step chain is NOT
# MXU-dot-issue-bound, and the manual DMA cannot overlap the load because
# every layer's weights are consumed within step 0 (~50 us in). The same
# bench's load_probe pins the per-frame VMEM weight load at ~40% of the
# kernel (bulk HBM->VMEM copies cap at ~1/3 of the chip's streaming rate
# in every structure tried: prologue, grid-pipelined, manual multi-depth).
# The variants stay default-on for the small win + ~2 MB VMEM freed at
# b=48 (rope matrices -> cos/sin rows).
#
# - "int8_head":   the audio_head streams as symmetric per-column int8
#                  codes (+ a resident (n_cb-1, 1, v_pad) f32 scale table)
#                  and the logits dot runs int8 x int8 -> int32: the head
#                  phase measured 0.53 ms of the 2.5 ms b=1 frame (probe
#                  arms below) and is dominated by moving the 4.45 MB bf16
#                  head slice per step — int8 halves both the HBM stream
#                  and the logits-dot VMEM reads, and frees 4.45 MB of
#                  VMEM (the double buffer drops to int8). Numerics: adds
#                  head-quantization noise to the decoder logits — same
#                  class as the existing W8A8 requant noise (the
#                  divergence probe gates it); greedy picks flip only at
#                  near-ties.
#
# "probe_*" opts are BENCH-ONLY kernel mutilations for phase attribution
# (resident_v2_ab.py): they change numerics and must never be on in
# production. probe_noquant: static activation scale, no absmax/sum
# reductions (times the per-matvec VPU quant chains). probe_nohead: skip
# the audio-head logits/sampling phase, token = s (times the head phase).
# probe_noattn: skip attention, use the value rows directly.
_ALL_OPTS = ("vpu_rope", "merged_attn", "dma_weights", "int8_head",
             "probe_noquant", "probe_nohead", "probe_noattn")


def _kernel_opts(b: int) -> FrozenSet[str]:
    """Resolve the kernel-variant set for batch `b` from the environment.

    `CSM_TPU_RESIDENT_OPTS` accepts "classic" (round-3 kernel, no variants),
    a comma list of opt names (explicit override, e.g. "vpu_rope"), or empty
    for the default: everything on, merged_attn only at b<=8 (VMEM)."""
    env = os.environ.get("CSM_TPU_RESIDENT_OPTS", "").strip()
    if env == "classic":
        return frozenset()
    if env:
        opts = set()
        for name in env.split(","):
            name = name.strip()
            if name and name not in _ALL_OPTS:
                raise ValueError(
                    f"unknown CSM_TPU_RESIDENT_OPTS entry {name!r}; "
                    f"valid: {', '.join(_ALL_OPTS)} or 'classic'")
            if name:
                opts.add(name)
        return frozenset(opts)
    opts = {"vpu_rope", "dma_weights", "int8_head"}
    if b <= 8:
        opts.add("merged_attn")
    return frozenset(opts)


def effective_max_batch(res: Dict[str, Any], requested: int) -> int:
    """Clamp the per-call row ceiling to 48 unless the VMEM-freeing round-4
    variants (vpu_rope: rotation matrices -> cos/sin rows; int8_head: bf16 ->
    int8 audio_head buffer) are both enabled AND their prepared tables exist.
    Rows in (48, 64] only fit VMEM with those frees; `classic` opts or a
    stale `_resident` snapshot would otherwise fail at Mosaic compile."""
    if requested <= 48:
        return requested
    opts = _kernel_opts(requested)
    if ("vpu_rope" in opts and "int8_head" in opts
            and "rope_cs" in res and "audio_head_q" in res):
        return requested
    return 48


def _rope_matrices(cfg, cap: int) -> np.ndarray:
    """(cap, hd, hd) f32: x @ M[p] == interleaved-pair RoPE at position p.

    out[2i]   = x[2i] c_i - x[2i+1] s_i
    out[2i+1] = x[2i+1] c_i + x[2i] s_i
    Expressed as a matmul so the kernel never does even/odd lane shuffles.
    """
    from csm_mlx_tpu.ops.rope import rope_cache

    cos, sin = rope_cache(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling, cap)
    hd = cfg.head_dim
    m = np.zeros((cap, hd, hd), np.float32)
    idx = np.arange(hd // 2)
    m[:, 2 * idx, 2 * idx] = cos
    m[:, 2 * idx + 1, 2 * idx] = -sin
    m[:, 2 * idx, 2 * idx + 1] = sin
    m[:, 2 * idx + 1, 2 * idx + 1] = cos
    return m


def _rope_cs(cfg, cap: int) -> np.ndarray:
    """(cap, 3, hd) f32 table for the elementwise "vpu_rope" variant.

    RoPE on an interleaved-pair row x becomes pure VPU math with two lane
    rolls and no selects/iotas (Mosaic-friendly):

        out = x * row[0] + roll(x, -1) * row[1] + roll(x, +1) * row[2]

    row[0][2i] = row[0][2i+1] = cos_i; row[1][2i] = -sin_i (odd lanes 0);
    row[2][2i+1] = sin_i (even lanes 0). The zeros also absorb the rolls'
    lane-127->0 wraparound. Same cos/sin source as `_rope_matrices`, so the
    two forms agree to fp rounding (the matmul form sums 126 extra exact
    zeros; the elementwise form is two FMAs)."""
    from csm_mlx_tpu.ops.rope import rope_cache

    cos, sin = rope_cache(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling, cap)
    hd = cfg.head_dim
    t = np.zeros((cap, 3, hd), np.float32)
    idx = np.arange(hd // 2)
    t[:, 0, 2 * idx] = cos
    t[:, 0, 2 * idx + 1] = cos
    t[:, 1, 2 * idx] = -sin
    t[:, 2, 2 * idx + 1] = sin
    return t


def _frame_kernel(
    # ---- static (bound via partial) ----
    b: int,
    n_layers: int,
    n_heads: int,
    n_kv: int,
    hd: int,
    d: int,
    f: int,
    n_cb: int,
    v: int,
    v_pad: int,
    eps: float,
    temperature: float,
    kv_dtype,
    opts: FrozenSet[str],
    interpret: bool,
    *refs,
):
    """One whole CSM frame for a static batch of `b` lockstep rows.

    See the module docstring for the phase layout. All rows advance through
    the same step index (the batch generation loop keeps rows in lockstep
    and handles per-row EOS outside), so the KV cache, audio_head buffer,
    and rope matrices are shared; only activations, sampled tokens, and the
    embedding gathers are per-row. Attention runs as ONE block-diagonal
    matmul over the batch-flattened KV scratch (a (b·group, cap·b) score
    matrix with a precomputed own-row block mask) instead of b×n_kv peeled
    matmuls — the peeled form made the unrolled Mosaic program large enough
    to SIGABRT the compiler past b=8.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    attn = n_heads * hd
    kvd = n_kv * hd
    group = n_heads // n_kv
    scale = hd ** -0.5
    cap = n_cb  # positions 0..31
    merged = "merged_attn" in opts
    vpu_rope = "vpu_rope" in opts
    dma_weights = "dma_weights" in opts
    int8_head = "int8_head" in opts
    n_mask = 3 if merged else 2
    hoff = 1 if int8_head else 0

    (seed_ref, proj01_ref, rot_ref) = refs[:3]
    w = refs[3:3 + 10 * n_layers]
    normf_ref = refs[3 + 10 * n_layers]
    ah_ref = refs[4 + 10 * n_layers]       # HBM (n_cb-1, d, v_pad) bf16/int8
    if int8_head:
        ahs_ref = refs[5 + 10 * n_layers]  # VMEM (n_cb-1, 1, v_pad) f32
    emb_ref = refs[5 + hoff + 10 * n_layers]  # HBM ((n_cb-2)*v, 1, d) f32
    # masks: merged -> (colkey, colpos, rowkey) int32; classic ->
    # (bmask bf16, colpos int32). See _attn_masks.
    masks = refs[6 + hoff + 10 * n_layers:
                 6 + hoff + 10 * n_layers + n_mask]
    tok_ref = refs[6 + hoff + 10 * n_layers + n_mask]  # VMEM out (n_cb, b)
    scr = refs[7 + hoff + 10 * n_layers + n_mask:]
    (kc_ref, vc_ref, ah_buf, emb_buf, x_sc, ah_sem, emb_sem) = scr[:7]
    if dma_weights:
        wscr = scr[7:7 + 4 * n_layers]     # VMEM mirrors of the big int8 ws
        wsem = scr[7 + 4 * n_layers]       # DMA sems, one per big weight

    if temperature > 0.0:
        pltpu.prng_seed(seed_ref[0])

    # big-weight source refs (ANY/HBM under dma_weights) in wscr order
    bigw = []
    for li in range(n_layers):
        lw = w[10 * li:10 * li + 10]
        bigw += [lw[1], lw[3], lw[6], lw[8]]   # qkv_q, o_q, gu_q, dn_q

    def w_dma(j):
        return pltpu.make_async_copy(bigw[j], wscr[j], wsem.at[j])

    if dma_weights:
        # Layer-major start order: layer 0's ~26 MB lands first so step-0
        # compute can begin while layers 1..3 are still in flight.
        for j in range(4 * n_layers):
            w_dma(j).start()

    def ah_dma(i, p):
        return pltpu.make_async_copy(ah_ref.at[i], ah_buf.at[p], ah_sem.at[p])

    def emb_dma(row, bi):
        return pltpu.make_async_copy(emb_ref.at[row], emb_buf.at[bi],
                                     emb_sem.at[bi])

    def mv(x, q_ref, sz_ref):
        """W8A8 matmul: dynamic per-row int8 activation quant, int8xint8 on
        the MXU, per-channel affine correction (ops/quant.py:148-218)."""
        if "probe_noquant" in opts:   # BENCH-ONLY: times the VPU quant chain
            xq = jnp.clip(jnp.round(x * 8.0), -127, 127).astype(jnp.int8)
            p = jax.lax.dot_general(
                xq, q_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return p.astype(jnp.float32) * sz_ref[...][0:1, :] * 0.125
        absmax = jnp.maximum(
            jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6)   # (b, 1)
        inv_xs = absmax * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(x * (127.0 / absmax)), -127, 127).astype(
            jnp.int8)
        p = jax.lax.dot_general(
            xq, q_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sz = sz_ref[...]
        return (p.astype(jnp.float32) * sz[0:1, :] * inv_xs
                + sz[1:2, :] * jnp.sum(x, axis=-1, keepdims=True))

    def rms(x, g_ref):
        rr = jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + eps)        # (b, 1)
        return x * rr * g_ref[...]

    def roll_l(x, shift):
        # pltpu.roll has no interpret-mode rule; jnp.roll is value-identical
        # (a pure lane permutation) and only used on CPU. Mosaic's roll
        # requires a non-negative shift: -1 rides as lanes-1.
        if interpret:
            return jnp.roll(x, shift, axis=1)
        return pltpu.roll(x, shift % x.shape[1], 1)

    def layer(li, x, s, rot_m):
        (ln1, qkv_q, qkv_sz, o_q, o_sz, ln2, gu_q, gu_sz, dn_q, dn_sz) = \
            w[10 * li:10 * li + 10]
        if dma_weights:
            qkv_q, o_q, gu_q, dn_q = wscr[4 * li:4 * li + 4]

            # Step 0 only: block until this layer's weight DMAs land (the
            # fori_loop is sequential, so every later step is ordered after
            # these waits).
            @pl.when(s == 0)
            def _():
                for j in range(4):
                    w_dma(4 * li + j).wait()

        h = rms(x, ln1)
        qkv = mv(h, qkv_q, qkv_sz)                     # (b, attn+2*kvd)
        q = qkv[:, :attn].reshape(b * n_heads, hd)
        k = qkv[:, attn:attn + kvd].reshape(b * n_kv, hd)
        val = qkv[:, attn + kvd:]                      # (b, kvd)

        if vpu_rope:
            # rot_m is the (3, hd) cos/sin row for position s (see _rope_cs):
            # two lane rolls + FMAs on the VPU instead of two MXU dots.
            cos_l, sin_a, sin_b = rot_m[0:1], rot_m[1:2], rot_m[2:3]
            q_rot = q * cos_l + roll_l(q, -1) * sin_a + roll_l(q, 1) * sin_b
            k_rot = k * cos_l + roll_l(k, -1) * sin_a + roll_l(k, 1) * sin_b
        else:
            dn = (((1,), (0,)), ((), ()))
            q_rot = jax.lax.dot_general(q, rot_m, dn,
                                        preferred_element_type=jnp.float32)
            k_rot = jax.lax.dot_general(k, rot_m, dn,
                                        preferred_element_type=jnp.float32)

        kc_ref[li, pl.ds(s, 1), :, :] = k_rot.reshape(1, b, kvd).astype(
            kv_dtype)
        vc_ref[li, pl.ds(s, 1), :, :] = val.reshape(1, b, kvd).astype(
            kv_dtype)

        if "probe_noattn" in opts:    # BENCH-ONLY: times the attention block
            a = jnp.concatenate([val] * (attn // kvd), axis=1)
        elif merged:
            # One score + one AV dot per layer-step: queries (b*heads, hd)
            # against the fully flattened KV (cap*b*n_kv, hd). Column j is
            # (position j//(b*n_kv), batch (j//n_kv)%b, kv-group j%n_kv);
            # the precomputed int32 ownership key masks each query row to
            # its own (batch, group) columns, `where` (not add) so masked
            # slots are exactly NEG.
            colkey_ref, colpos_ref, rowkey_ref = masks
            keep = jnp.logical_and(colkey_ref[...] == rowkey_ref[...],
                                   colpos_ref[...] <= s)
            kall = kc_ref[li].astype(jnp.float32).reshape(cap * b * n_kv, hd)
            sc = jax.lax.dot_general(
                q_rot, kall, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            sc = jnp.where(keep, sc, NEG)
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            vall = vc_ref[li].astype(jnp.float32).reshape(cap * b * n_kv, hd)
            # zero-masked columns contribute exact 0s; scratch is zeroed at
            # frame start so no NaN can poison the product.
            a = jax.lax.dot_general(
                p, vall, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(b, attn)
        else:
            # Block-diagonal batched attention, one matmul pair per
            # kv-group: column j = position j//b of batch row j%b.
            bmask_ref, colpos_ref = masks
            q3 = q_rot.reshape(b, n_heads, hd)
            # bmask is stored bf16 (VMEM) but compared in f32: Mosaic has
            # no bf16 comparison on this target.
            keep = jnp.logical_and(bmask_ref[...].astype(jnp.float32) > 0,
                                   colpos_ref[...] <= s)
            outs = []
            for g in range(n_kv):
                qg = q3[:, g * group:(g + 1) * group, :].reshape(
                    b * group, hd)
                kg = kc_ref[li][:, :, g * hd:(g + 1) * hd].astype(
                    jnp.float32).reshape(cap * b, hd)
                sc = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                sc = jnp.where(keep, sc, NEG)
                m = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp(sc - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                vg = vc_ref[li][:, :, g * hd:(g + 1) * hd].astype(
                    jnp.float32).reshape(cap * b, hd)
                outs.append(jax.lax.dot_general(
                    p, vg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(
                        b, group * hd))
            a = jnp.concatenate(outs, axis=1)                # (b, attn)
        x = x + mv(a, o_q, o_sz)
        h2 = rms(x, ln2)
        gu = mv(h2, gu_q, gu_sz)                       # (b, 2f)
        act = gu[:, :f] * jax.nn.sigmoid(gu[:, :f]) * gu[:, f:]
        return x + mv(act, dn_q, dn_sz)

    tok_ref[pl.ds(0, 1), :] = jnp.zeros((1, b), jnp.int32)
    # Zero the KV scratch: slots past the current step are masked out of the
    # softmax, but NaN garbage would still poison the P @ V product (0 * NaN).
    kc_ref[...] = jnp.zeros_like(kc_ref)
    vc_ref[...] = jnp.zeros_like(vc_ref)
    nohead = "probe_nohead" in opts  # BENCH-ONLY: times the head phase
    if not nohead:
        ah_dma(0, 0).start()
        ah_dma(1, 1).start()

    def step(s, carry):
        # ---- input embedding for this step --------------------------------
        @pl.when(s < 2)
        def _():
            x_sc[...] = proj01_ref[pl.ds(s, 1), :, :].reshape(b, d)

        @pl.when(s >= 2)
        def _():
            for bi in range(b):
                emb_dma(0, bi).wait()
            x_sc[...] = emb_buf[...].astype(jnp.float32).reshape(b, d)

        x = x_sc[...]
        if vpu_rope:
            # (3, hd) cos/sin row for position s (f32 — the table is tiny)
            rot_m = rot_ref[pl.ds(s, 1), :, :].reshape(3, hd)
        else:
            # rot arrives bf16 past b=8 (VMEM budget); widen so the RoPE
            # matmul itself stays f32 either way.
            rot_m = rot_ref[pl.ds(s, 1), :, :].reshape(hd, hd).astype(
                jnp.float32)
        for li in range(n_layers):
            x = layer(li, x, s, rot_m)
        h = rms(x, normf_ref)

        # ---- sample codebook s from audio_head[s-1] -----------------------
        if nohead:
            # BENCH-ONLY: fixed token, no ah stream / logits / argmax; the
            # embed-gather chain stays (it is its own phase).
            @pl.when(s >= 1)
            def _():
                tokv = jnp.full((b, 1), 7, jnp.int32)
                tok_ref[pl.ds(s, 1), :] = tokv.reshape(1, b)
                row_id = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
                for bi in range(b):
                    tok = jnp.sum(jnp.where(row_id == bi, tokv, 0))

                    @pl.when(s <= n_cb - 2)
                    def _():
                        emb_dma((s - 1) * v + tok, bi).start()

            return carry

        @pl.when(s >= 1)
        def _():
            p = jax.lax.rem(s - 1, 2)
            ah_dma(s - 1, p).wait()
            head = ah_buf[pl.ds(p, 1), :, :].reshape(d, v_pad)
            if int8_head:
                # int8 x int8 logits: dynamic per-row quant of h (the VPU
                # chain measured free — probe_noquant), symmetric
                # per-column dequant from the resident scale table
                hab = jnp.maximum(
                    jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6)
                hq = jnp.clip(jnp.round(h * (127.0 / hab)),
                              -127, 127).astype(jnp.int8)
                pint = jax.lax.dot_general(
                    hq, head, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                srow = ahs_ref[pl.ds(s - 1, 1), :, :].reshape(1, v_pad)
                logits = (pint.astype(jnp.float32) * srow
                          * (hab * (1.0 / 127.0)))
            else:
                logits = jax.lax.dot_general(
                    h.astype(jnp.bfloat16), head,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (b, v_pad)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (b, v_pad), 1)
            logits = jnp.where(lanes < v, logits, NEG)
            if temperature > 0.0:
                from jax.experimental.pallas import tpu as _pltpu

                bits = _pltpu.bitcast(
                    _pltpu.prng_random_bits((b, v_pad)), jnp.int32)
                u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
                g = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
                logits = logits * (1.0 / temperature) + g
                logits = jnp.where(lanes < v, logits, NEG)

            # Vectorized per-row argmax (first-max-lane, matching the peeled
            # original); only the scalar extraction of each row's token —
            # needed as a *scalar* DMA index for the embedding gather — is
            # peeled, as a masked full-reduction.
            m = jnp.max(logits, axis=-1, keepdims=True)
            tokv = jnp.min(
                jnp.where(logits == m, lanes, jnp.int32(2 ** 30)),
                axis=-1, keepdims=True)                      # (b, 1)
            tok_ref[pl.ds(s, 1), :] = tokv.reshape(1, b)
            row_id = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
            for bi in range(b):
                tok = jnp.sum(jnp.where(row_id == bi, tokv, 0))

                # gather the projected embedding of the token just sampled —
                # the input of step s+1 (embed slot s, table row (s-1)*v+tok)
                @pl.when(s <= n_cb - 2)
                def _():
                    emb_dma((s - 1) * v + tok, bi).start()

            # prefetch audio_head for step s+2 (reuses this parity's buffer
            # only after the logits dot above has consumed it)
            @pl.when(s + 1 <= n_cb - 2)
            def _():
                ah_dma(s + 1, p).start()

        return carry

    jax.lax.fori_loop(0, n_cb, step, jnp.int32(0))


@functools.lru_cache(maxsize=16)
def _build_frame_call(shape_key, temperature: float, interpret: bool,
                      opts: FrozenSet[str]):
    """Cache the pallas_call per (decoder geometry, temperature, variants)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (b, n_layers, n_heads, n_kv, hd, d, f, n_cb, v, v_pad, eps) = shape_key
    attn = n_heads * hd
    kvd = n_kv * hd
    n_mask = 3 if "merged_attn" in opts else 2
    dma_weights = "dma_weights" in opts
    # f32 KV keeps bit-parity with the dispatched path; past b=8 the f32
    # scratch no longer fits VMEM next to the resident weights, and bf16
    # KV (identical bytes to the b=8 f32 scratch at b=16) is the price of
    # running the kernel at all.
    kv_dtype = jnp.float32 if b <= 8 else jnp.bfloat16

    kernel = functools.partial(
        _frame_kernel, b, n_layers, n_heads, n_kv, hd, d, f, n_cb, v, v_pad,
        eps, temperature, kv_dtype, opts, interpret)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]           # seed
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2      # proj01, rot
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    for _ in range(n_layers):
        if dma_weights:
            # big int8 arrays stay in HBM (manually DMA'd into scratch);
            # layout: ln1, qkv_q, qkv_sz, o_q, o_sz, ln2, gu_q, gu_sz,
            #         dn_q, dn_sz
            in_specs += [vmem, hbm, vmem, hbm, vmem,
                         vmem, hbm, vmem, hbm, vmem]
        else:
            in_specs += [vmem] * 10
    in_specs += [vmem]                                            # norm
    in_specs += [hbm]                                             # ah codes
    if "int8_head" in opts:
        in_specs += [vmem]                                        # ah scales
    in_specs += [hbm]                                             # embed tab
    in_specs += [vmem] * n_mask                                   # attn masks

    ah_dtype = jnp.int8 if "int8_head" in opts else jnp.bfloat16
    scratch = [
        pltpu.VMEM((n_layers, n_cb, b, kvd), kv_dtype),     # K cache
        pltpu.VMEM((n_layers, n_cb, b, kvd), kv_dtype),     # V cache
        pltpu.VMEM((2, d, v_pad), ah_dtype),              # audio_head 2x
        pltpu.VMEM((b, 1, d), jnp.float32),               # embed rows
        pltpu.VMEM((b, d), jnp.float32),                  # x
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((b,)),
    ]
    if dma_weights:
        for _ in range(n_layers):
            scratch += [
                pltpu.VMEM((attn + 2 * kvd, d), jnp.int8),   # qkv_q
                pltpu.VMEM((d, d), jnp.int8),                # o_q
                pltpu.VMEM((2 * f, d), jnp.int8),            # gu_q
                pltpu.VMEM((d, f), jnp.int8),                # dn_q
            ]
        scratch += [pltpu.SemaphoreType.DMA((4 * n_layers,))]

    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cb, b), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _attn_masks(b: int, group: int, cap: int, n_kv: int, merged: bool):
    """Static attention masks, precomputed host-side so the kernel never
    does integer div/rem on iotas.

    Classic (per-kv-group) layout: bmask[(bi*group + gi), (c*b + bj)] = 1.0
    iff bj == bi (a query row may only attend to its own batch row's KV
    columns); colpos[0, j] = j // b maps a flattened KV column to its cache
    position for the `<= s` mask.

    Merged layout (one dot over all kv-groups): column j of the flattened
    (cap*b*n_kv, hd) KV is (position j//(b*n_kv), batch (j//n_kv)%b, group
    j%n_kv); query row r = bi*heads + h owns key bi*n_kv + h//group. keep =
    (colkey == rowkey) & (colpos <= s) — int32 compares (Mosaic has no bf16
    compare)."""
    import jax.numpy as _jnp  # dtype only; arrays stay numpy (see below)

    if merged:
        heads = group * n_kv
        j = np.arange(cap * b * n_kv)
        colpos = (j // (b * n_kv)).astype(np.int32)[None, :]
        colkey = (((j // n_kv) % b) * n_kv + (j % n_kv)).astype(
            np.int32)[None, :]
        r = np.arange(b * heads)
        rowkey = ((r // heads) * n_kv + (r % heads) // group).astype(
            np.int32)[:, None]
        # numpy (not jnp): this cache is populated inside jit traces, and a
        # cached jnp constant from one trace leaks as a tracer into the next.
        return colkey, colpos, rowkey

    cols = np.arange(cap * b)
    rows = np.arange(b * group)
    # bf16: the mask is boolean-valued, and at b=48 an f32 (b*group, cap*b)
    # costs >1 MB of the VMEM budget.
    bmask = (cols[None, :] % b == rows[:, None] // group).astype(
        _jnp.bfloat16)
    colpos = (cols // b).astype(np.int32)[None, :]
    return bmask, colpos


def resident_decode_frame(res: Dict[str, Any], args, proj01: jax.Array,
                          seed: jax.Array, temperature: float) -> jax.Array:
    """Run one frame for a batch. proj01: (2, B, d_decoder) f32 — projected
    [backbone_hidden, c0_embed] per row. Returns (n_cb, B) int32; row 0 is
    zeros (c0 is sampled by the caller), rows 1..31 are the decoder
    codebooks for every batch row."""
    dcfg = args.decoder_config
    v = args.n_audio_vocab
    v_pad = res["audio_head"].shape[-1]
    b = proj01.shape[1]
    shape_key = (
        b, dcfg.num_hidden_layers, dcfg.num_attention_heads,
        dcfg.num_key_value_heads, dcfg.head_dim, dcfg.hidden_size,
        dcfg.intermediate_size, args.n_audio_codebooks, v, v_pad,
        dcfg.rms_norm_eps,
    )
    opts = _kernel_opts(b)
    if "rope_cs" not in res:
        # tables built by an older prepare_resident_decoder: no cos/sin row
        # table — fall back to the rotation-matrix RoPE for this call.
        opts = opts - {"vpu_rope"}
    if "audio_head_q" not in res:
        opts = opts - {"int8_head"}
    call = _build_frame_call(shape_key, float(temperature),
                             jax.default_backend() == "cpu", opts)
    masks = _attn_masks(
        b, dcfg.num_attention_heads // dcfg.num_key_value_heads,
        args.n_audio_codebooks, dcfg.num_key_value_heads,
        "merged_attn" in opts)
    if "vpu_rope" in opts:
        rot = res["rope_cs"]     # (cap, 3, hd) f32 — tiny, no bf16 economy
    else:
        # Same b>8 VMEM economy as the KV scratch: the 2 MB f32 rotation
        # table rides as bf16 (values rounded; the matmul widens to f32).
        rot = res["rot"] if b <= 8 else res["rot"].astype(jnp.bfloat16)
    flat = [seed, proj01.astype(jnp.float32), rot]
    for lw in res["layers"]:
        flat += lw
    if "int8_head" in opts:
        heads = [res["audio_head_q"], res["audio_head_s"]]
    else:
        heads = [res["audio_head"]]
    flat += [res["norm"], *heads, res["embed_tab"], *masks]
    return call(*flat)


# ---------------------------------------------------------------------------
# Table preparation
# ---------------------------------------------------------------------------


def _as_sz(qp: Dict[str, Any]) -> jax.Array:
    """(out,1) scales + (out,1) biases -> (2, out) f32 row pair."""
    return jnp.concatenate(
        [qp["scales"].reshape(1, -1), qp["biases"].reshape(1, -1)], axis=0
    ).astype(jnp.float32)


def prepare_resident_decoder(model) -> bool:
    """Derive the kernel's tables into model.params["_resident"].

    Requires the decoder to be W8A8-quantized with fused qkv/gateup layouts
    (`quantize_model(mode="w8a8", fuse=True)`) and a raw (un-quantized)
    audio_head. Returns False (and leaves params untouched) if the layout
    doesn't match — generation then keeps the dispatched path.
    """
    from csm_mlx_tpu.ops.layers import linear

    p = model.params
    args = model.args
    dcfg = args.decoder_config
    dec = p.get("decoder")
    head = p.get("audio_head")
    if not dec or head is None or isinstance(head, dict):
        return False  # int8 audio_head option not supported in-kernel
    if dcfg.num_attention_heads * dcfg.head_dim != dcfg.hidden_size:
        return False

    # Live LoRA adapters on any consumed component would be silently
    # dropped from the snapshot (ops/layers.linear applies the lora delta
    # on top of weight_q; the kernel tables would not) — resident and
    # dispatched decode would then diverge with no error. Fall back.
    if any(isinstance(p.get(k), dict) and "lora_a" in p[k]
           for k in ("projection", "audio_embeddings")):
        return False

    layers = []
    for lp in dec["layers"]:
        at, mlp = lp["self_attn"], lp["mlp"]
        if "qkv_proj" not in at or "gateup_proj" not in mlp:
            return False
        parts = (at["qkv_proj"], at["o_proj"], mlp["gateup_proj"],
                 mlp["down_proj"])
        if any("weight_q" not in q or q["weight_q"].dtype != jnp.int8
               or "lora_a" in q for q in parts):
            return False
        qkv, o, gu, dn = parts
        layers.append([
            lp["input_layernorm"]["weight"].astype(jnp.float32).reshape(1, -1),
            qkv["weight_q"], _as_sz(qkv),
            o["weight_q"], _as_sz(o),
            lp["post_attention_layernorm"]["weight"].astype(
                jnp.float32).reshape(1, -1),
            gu["weight_q"], _as_sz(gu),
            dn["weight_q"], _as_sz(dn),
        ])

    n_cb = args.n_audio_codebooks
    v = args.n_audio_vocab
    v_pad = -(-v // 128) * 128

    # Projected audio-embedding table for codebook slots 1..n_cb-2: the
    # decoder consumes projection(embed(token, slot)) — precomputing folds
    # the per-step projection matvec into a 2 KB row gather. When the
    # projection is W8A8-quantized, reproduce the Pallas matvec's exact
    # arithmetic (per-row dynamic int8 activation quant + affine fixup,
    # ops/quant.py:148-218) rather than linear()'s large-batch dequant
    # fallback, so resident and dispatched decode feed bit-matching inputs.
    emb = p["audio_embeddings"]["weight"]
    rows = emb[v:(n_cb - 1) * v]  # slots 1..n_cb-2
    pq = p["projection"]
    if "weight_q" in pq and pq["weight_q"].dtype == jnp.int8:
        @jax.jit
        def proj(r):
            xf = r.astype(jnp.float32)
            absmax = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
            xq = jnp.clip(jnp.round(xf * (127.0 / absmax)),
                          -127, 127).astype(jnp.int8)
            out = jax.lax.dot_general(
                xq, pq["weight_q"], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            return (out * pq["scales"].reshape(1, -1) * (absmax / 127.0)
                    + pq["biases"].reshape(1, -1)
                    * jnp.sum(xf, axis=-1, keepdims=True))
    else:
        proj = jax.jit(lambda r: linear(pq, r))

    chunks = []
    step = 8192
    for i in range(0, rows.shape[0], step):
        chunks.append(np.asarray(proj(rows[i:i + step]), dtype=np.float32))
    # f32 rows: Mosaic requires HBM DMA slices aligned to the dtype's
    # sublane tiling (2 for bf16), which a (N, 1, d) bf16 row gather
    # violates; f32 single-row slices are accepted (probe-verified).
    tab = jnp.asarray(np.concatenate(chunks, 0), jnp.float32)
    tab = tab.reshape(-1, 1, dcfg.hidden_size)

    res = {
        "layers": layers,
        "norm": p["decoder"]["norm"]["weight"].astype(
            jnp.float32).reshape(1, -1),
        "rot": jnp.asarray(_rope_matrices(dcfg, n_cb)),
        "rope_cs": jnp.asarray(_rope_cs(dcfg, n_cb)),
        "embed_tab": tab,
    }
    set_resident_audio_head(res, head, v_pad)
    p["_resident"] = res
    return True


def set_resident_audio_head(res: Dict[str, Any], head: jax.Array,
                            v_pad: int) -> None:
    """(Re)derive the kernel's audio_head tables from a raw (n_cb-1, d, v)
    tensor: the 128-padded bf16 form plus symmetric per-column int8 codes
    and their (n_cb-1, 1, v_pad) f32 scale table (the "int8_head" variant).
    Also the hook benches use to swap heads without a full re-prepare."""
    v = head.shape[-1]
    padded = jnp.pad(jnp.asarray(head, jnp.bfloat16),
                     ((0, 0), (0, 0), (0, v_pad - v)))
    hf = padded.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(hf), axis=1, keepdims=True) / 127.0,
                    1e-12)                                # (n_cb-1, 1, v_pad)
    res["audio_head"] = padded
    res["audio_head_q"] = jnp.clip(jnp.round(hf / s), -127, 127).astype(
        jnp.int8)
    res["audio_head_s"] = s.astype(jnp.float32)


def sampler_supported(sampler) -> bool:
    """The kernel implements greedy and plain temperature-categorical —
    exactly the reference's decoder-step semantics (generation.py:81-84).
    Any plain SamplerConfig qualifies: its top-k/top-p/min-p chain applies
    to codebook 0 only (sampled by the caller OUTSIDE the kernel), and the
    dispatched path uses the same plain-temperature decoder sampling. The
    type check is exact: a custom sampler (or SamplerConfig subclass
    overriding __call__) carries decoder-step logic the kernel cannot
    honor, so it falls back to the dispatched path."""
    from csm_mlx_tpu.ops.sampling import SamplerConfig

    return type(sampler) is SamplerConfig
