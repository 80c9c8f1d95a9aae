"""int8 big-tier KV vs bf16 in the tiered block-decode attention (B=48).

After the tiered KV carry (micro_kv_carry.py, ops/kv_cache.py) the block
decode reads the big cache buffers at the streaming rate — so KV BYTES
are now the dominant backbone-step term at serving shapes (B=48 x cap
640: ~0.98 GB/step of bf16 K/V). Storing the big tier as int8 with a
per-(B, head, position) scale halves those bytes IF XLA reads int8 fast
and fuses the dequant into the attention dots (round-2 lesson: it does
NOT fuse int8 dequant into weight matmuls — this measures the attention
case, where the dequant can be folded OUTSIDE the dot: logits scale by
s_k[pos] after the QK^T dot, and s_v folds into the probs before PV).

Arms (each the tiered inner-scan structure, 16 layers x REPS steps, one
jit; interleaved round-robin):

  bf16     big tier bf16 (the shipping path) — baseline
  int8     big tier int8 + per-position f32 scales; QK^T in bf16 after an
           in-dot astype, logits * s_k; probs * s_v before bf16 PV dot
  int8dot  QK^T as a true int8 x int8 -> int32 MXU dot (q requantized
           per step to int8 with one per-(b,head) scale), logits =
           i32 * (s_q * s_k); PV as in `int8`

Run on TPU: python benchmarks/micro_kv_int8.py [arm ...]
Env: KVI_B=48 KVI_CAP=640 KVI_REPS=64 KVI_ROUNDS=3
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("KVI_B", "48"))
CAP = int(os.environ.get("KVI_CAP", "640"))
REPS = int(os.environ.get("KVI_REPS", "64"))
ROUNDS = int(os.environ.get("KVI_ROUNDS", "3"))
# 16 = the real backbone; the remote compiler chokes on the full-depth
# doubly-nested scan (broken-pipe/1-h compiles) — the per-layer RATIO is
# depth-independent, so KVI_LAYERS=4 is the practical A/B configuration.
LAYERS = int(os.environ.get("KVI_LAYERS", "16"))
NKV, GROUP, HD = 8, 4, 64
K = 8
NEG = -0.7 * float(np.finfo(np.float32).max)


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    want = sys.argv[1:] or ["bf16", "int8", "int8dot"]
    rng = np.random.RandomState(0)
    ks = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    vs = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    # int8 big tier: per-(L, B, NKV, CAP) absmax scales over HD.
    def quant(x):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
        q = jnp.round(x.astype(jnp.float32) / s[..., None]).astype(jnp.int8)
        return q, s
    ks_q, ks_s = quant(ks)
    vs_q, vs_s = quant(vs)
    q0 = jnp.asarray(rng.randn(B, NKV, GROUP, HD), jnp.bfloat16)
    pad = jnp.asarray(rng.randint(0, 64, (B,)), jnp.int32)
    kv_bytes_bf16 = LAYERS * 2 * B * NKV * CAP * HD * 2
    kv_bytes_int8 = LAYERS * 2 * B * NKV * CAP * (HD + 4)
    kpos = jnp.arange(CAP, dtype=jnp.int32)
    rpos = jnp.arange(K, dtype=jnp.int32)

    def new_kv(q):
        kn = (q[:, :, :1] * 0.1).reshape(B, NKV, 1, HD)
        vn = (q[:, :, 1:2] * 0.2).reshape(B, NKV, 1, HD)
        return kn, vn

    def recent_logits(q, rk, j):
        lr = jnp.einsum("bkgd,bkld->bkgl", q, rk,
                        preferred_element_type=jnp.float32)
        return jnp.where(rpos[None, None, None] <= j, lr, NEG)

    def tiered_driver(layer_attn):
        """Common outer/inner scan; layer_attn(q, li, rk, rv, m_big, j)."""
        def run(q0):
            def outer(carry, bi):
                q, idx0 = carry
                rk = jnp.zeros((LAYERS, B, NKV, K, HD), jnp.bfloat16)
                rv = jnp.zeros((LAYERS, B, NKV, K, HD), jnp.bfloat16)
                ok_big = (kpos[None] >= pad[:, None]) & (kpos[None] < idx0)
                m_big = jnp.where(ok_big, 0.0, NEG).astype(jnp.float32)[
                    :, None, None]

                def inner(c2, j):
                    q, rk, rv = c2
                    for li in range(LAYERS):
                        kn, vn = new_kv(q)
                        rk = jax.lax.dynamic_update_slice(
                            rk, kn.astype(rk.dtype)[None], (li, 0, 0, j, 0))
                        rv = jax.lax.dynamic_update_slice(
                            rv, vn.astype(rv.dtype)[None], (li, 0, 0, j, 0))
                        o = layer_attn(q, li, rk[li], rv[li], m_big, j)
                        q = q + 1e-6 * o.astype(q.dtype)
                    return (q, rk, rv), q[0, 0, 0, 0]

                (q, rk, rv), outs = jax.lax.scan(inner, (q, rk, rv),
                                                 jnp.arange(K))
                # No merge arm here: the merge DUS is identical across
                # arms (int8 adds a requant of K rows — negligible bytes)
                # and micro_kv_carry already measured it.
                return (q, idx0 + K), jnp.sum(outs)

            (q, _i), outs = jax.lax.scan(
                outer, (q0, jnp.asarray(64, jnp.int32)),
                jnp.arange(REPS // K))
            return jnp.sum(outs)

        return run

    def attn_bf16(q, li, rk, rv, m_big, j):
        lb = jnp.einsum("bkgd,bkld->bkgl", q, ks[li],
                        preferred_element_type=jnp.float32) + m_big
        logits = jnp.concatenate([lb, recent_logits(q, rk, j)], axis=-1)
        p = jax.nn.softmax(logits, axis=-1)
        return (jnp.einsum("bkgl,bkld->bkgd", p[..., :CAP].astype(vs.dtype),
                           vs[li], preferred_element_type=jnp.float32)
                + jnp.einsum("bkgl,bkld->bkgd", p[..., CAP:].astype(rv.dtype),
                             rv, preferred_element_type=jnp.float32))

    def attn_int8(q, li, rk, rv, m_big, j):
        lb = jnp.einsum("bkgd,bkld->bkgl", q,
                        ks_q[li].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lb = lb * ks_s[li][:, :, None, :] + m_big
        logits = jnp.concatenate([lb, recent_logits(q, rk, j)], axis=-1)
        p = jax.nn.softmax(logits, axis=-1)
        pb = (p[..., :CAP] * vs_s[li][:, :, None, :]).astype(jnp.bfloat16)
        return (jnp.einsum("bkgl,bkld->bkgd", pb,
                           vs_q[li].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
                + jnp.einsum("bkgl,bkld->bkgd", p[..., CAP:].astype(rv.dtype),
                             rv, preferred_element_type=jnp.float32))

    def attn_int8dot(q, li, rk, rv, m_big, j):
        sq = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1,
                     keepdims=True) / 127.0
        qq = jnp.round(q.astype(jnp.float32) / sq).astype(jnp.int8)
        lb = jnp.einsum("bkgd,bkld->bkgl", qq, ks_q[li],
                        preferred_element_type=jnp.int32)
        lb = lb.astype(jnp.float32) * (sq * ks_s[li][:, :, None, :]) + m_big
        logits = jnp.concatenate([lb, recent_logits(q, rk, j)], axis=-1)
        p = jax.nn.softmax(logits, axis=-1)
        pb = (p[..., :CAP] * vs_s[li][:, :, None, :]).astype(jnp.bfloat16)
        return (jnp.einsum("bkgl,bkld->bkgd", pb,
                           vs_q[li].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
                + jnp.einsum("bkgl,bkld->bkgd", p[..., CAP:].astype(rv.dtype),
                             rv, preferred_element_type=jnp.float32))

    attns = {"bf16": attn_bf16, "int8": attn_int8, "int8dot": attn_int8dot}
    fns = {}
    for name in want:
        fns[name] = jax.jit(tiered_driver(attns[name]))
        t0 = time.perf_counter()
        jax.device_get(fns[name](q0))
        print(f"{name:8s} compile+first {time.perf_counter() - t0:6.1f}s",
              flush=True)

    best = {name: float("inf") for name in want}
    for r in range(ROUNDS):
        for name in want:  # interleaved round-robin
            t0 = time.perf_counter()
            jax.device_get(fns[name](q0))
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in want:
        by = kv_bytes_int8 if name.startswith("int8") else kv_bytes_bf16
        r = best[name]
        print(f"{name:8s} run {r*1e3:8.1f} ms  {r / REPS * 1e3:6.3f} ms/step"
              f"  {by * REPS / r / 1e9:6.1f} GB/s(own-bytes)", flush=True)


if __name__ == "__main__":
    main()
