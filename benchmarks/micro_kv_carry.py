"""Stacked vs per-layer KV-cache carries in the decode scan (B=48).

micro_attn_layout.py showed the PURE decode-attention einsums run at
~560 GB/s (1.80 ms/step at B=48 x cap 640, any layout) — but the `attn`
arm of micro_backbone_gap.py, which also THREADS the cache through the
scan and dynamic-update-slices each layer's new K/V, measured 4.69
ms/step. The delta is the carry machinery, not the math. Candidate: the
cache is ONE stacked (L, B, n_kv, cap, hd) buffer, and a per-layer DUS
into a buffer whose other layers are still being read defeats XLA's
in-place aliasing (the per-layer weight pytree won over stacked weights
for the same reason, CLAUDE.md). Arms, 16 layers x REPS steps in one jit:

  pure     read-only K/V, no carry updates — the floor
  stacked  carry one stacked (L, ...) pair, per-layer DUS (the product's
           KVCache layout)
  perlayer carry 16 separate (B, n_kv, cap, hd) pairs, DUS each its own
  tiered   two-tier: the big buffer is INVARIANT across each K=8-step
           inner scan (so XLA can pipeline its reads); only a tiny
           (L, B, n_kv, K, hd) recent tier is carried, DUS-merged into
           the big buffer once per block — the continuous engine's step
           program has exactly this block structure

Result (2026-08-19, interleaved-ish single process): pure 1.82 /
stacked 4.71 / perlayer 4.67 ms/step — the carry DEPENDENCY is the
cost, not the stacked layout; `tiered` is the candidate fix.

Run on TPU: python benchmarks/micro_kv_carry.py [arm ...]
Env: KVC_B=48 KVC_CAP=640 KVC_REPS=64
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("KVC_B", "48"))
CAP = int(os.environ.get("KVC_CAP", "640"))
REPS = int(os.environ.get("KVC_REPS", "64"))
LAYERS = 16
NKV, GROUP, HD = 8, 4, 64
NEG = -0.7 * float(np.finfo(np.float32).max)


def _time(jfn, *args):
    t0 = time.perf_counter()
    jax.device_get(jfn(*args))
    c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return c, best


def attn(q, k, v, m):
    logits = jnp.einsum("bkgd,bkld->bkgl", q, k,
                        preferred_element_type=jnp.float32) + m
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bkgl,bkld->bkgd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    want = sys.argv[1:] or ["pure", "stacked", "perlayer"]
    rng = np.random.RandomState(0)
    ks = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    vs = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    q0 = jnp.asarray(rng.randn(B, NKV, GROUP, HD), jnp.bfloat16)
    pad = jnp.asarray(rng.randint(0, 64, (B,)), jnp.int32)
    kv_bytes = LAYERS * 2 * B * NKV * CAP * HD * 2
    kpos = jnp.arange(CAP, dtype=jnp.int32)

    def mask_for(idx):
        ok = (kpos[None] >= pad[:, None]) & (kpos[None] <= idx)
        return jnp.where(ok, 0.0, NEG).astype(jnp.float32)[:, None, None]

    def run_pure(q0, ks, vs):
        def body(carry, i):
            q = carry
            m = mask_for(64 + (i % 32))
            for li in range(LAYERS):
                o = attn(q, ks[li], vs[li], m)
                q = q + 1e-6 * o.astype(q.dtype)
            return q, q[0, 0, 0, 0]

        q, outs = jax.lax.scan(body, q0, jnp.arange(REPS))
        return jnp.sum(outs)

    def run_stacked(q0, ks, vs):
        def body(carry, i):
            q, k5, v5, idx = carry
            m = mask_for(idx)
            for li in range(LAYERS):
                kn = (q[:, :, :1] * 0.1).reshape(B, NKV, 1, HD)
                vn = (q[:, :, 1:2] * 0.2).reshape(B, NKV, 1, HD)
                k5 = jax.lax.dynamic_update_slice(k5, kn.astype(k5.dtype)[None],
                                                  (li, 0, 0, idx, 0))
                v5 = jax.lax.dynamic_update_slice(v5, vn.astype(v5.dtype)[None],
                                                  (li, 0, 0, idx, 0))
                o = attn(q, k5[li], v5[li], m)
                q = q + 1e-6 * o.astype(q.dtype)
            return (q, k5, v5, idx + 1), q[0, 0, 0, 0]

        (q, _k, _v, _i), outs = jax.lax.scan(
            body, (q0, ks, vs, jnp.asarray(64, jnp.int32)),
            jnp.arange(REPS))
        return jnp.sum(outs)

    def run_perlayer(q0, ks, vs):
        kl = tuple(ks[li] for li in range(LAYERS))
        vl = tuple(vs[li] for li in range(LAYERS))

        def body(carry, i):
            q, kl, vl, idx = carry
            m = mask_for(idx)
            kl, vl = list(kl), list(vl)
            for li in range(LAYERS):
                kn = (q[:, :, :1] * 0.1).reshape(B, NKV, 1, HD)
                vn = (q[:, :, 1:2] * 0.2).reshape(B, NKV, 1, HD)
                kl[li] = jax.lax.dynamic_update_slice(
                    kl[li], kn.astype(kl[li].dtype), (0, 0, idx, 0))
                vl[li] = jax.lax.dynamic_update_slice(
                    vl[li], vn.astype(vl[li].dtype), (0, 0, idx, 0))
                o = attn(q, kl[li], vl[li], m)
                q = q + 1e-6 * o.astype(q.dtype)
            return (q, tuple(kl), tuple(vl), idx + 1), q[0, 0, 0, 0]

        (q, _k, _v, _i), outs = jax.lax.scan(
            body, (q0, kl, vl, jnp.asarray(64, jnp.int32)),
            jnp.arange(REPS))
        return jnp.sum(outs)

    def run_tiered(q0, ks, vs):
        K = 8
        blocks = REPS // K
        rpos = jnp.arange(K, dtype=jnp.int32)

        def outer(carry, bi):
            q, k5, v5, idx0 = carry
            rk = jnp.zeros((LAYERS, B, NKV, K, HD), ks.dtype)
            rv = jnp.zeros((LAYERS, B, NKV, K, HD), vs.dtype)
            # Big-tier mask: every position [pad, idx0) is valid for ALL
            # K inner steps — invariant, so k5/v5 reads can pipeline.
            ok_big = (kpos[None] >= pad[:, None]) & (kpos[None] < idx0)
            m_big = jnp.where(ok_big, 0.0, NEG).astype(jnp.float32)[
                :, None, None]

            def inner(c2, j):
                q, rk, rv = c2
                for li in range(LAYERS):
                    kn = (q[:, :, :1] * 0.1).reshape(B, NKV, 1, HD)
                    vn = (q[:, :, 1:2] * 0.2).reshape(B, NKV, 1, HD)
                    rk = jax.lax.dynamic_update_slice(
                        rk, kn.astype(rk.dtype)[None], (li, 0, 0, j, 0))
                    rv = jax.lax.dynamic_update_slice(
                        rv, vn.astype(rv.dtype)[None], (li, 0, 0, j, 0))
                    lb = jnp.einsum("bkgd,bkld->bkgl", q, k5[li],
                                    preferred_element_type=jnp.float32
                                    ) + m_big
                    lr = jnp.einsum("bkgd,bkld->bkgl", q, rk[li],
                                    preferred_element_type=jnp.float32)
                    lr = jnp.where(rpos[None, None, None] <= j, lr, NEG)
                    logits = jnp.concatenate([lb, lr], axis=-1)
                    p = jax.nn.softmax(logits, axis=-1)
                    o = (jnp.einsum("bkgl,bkld->bkgd",
                                    p[..., :CAP].astype(v5.dtype), v5[li],
                                    preferred_element_type=jnp.float32)
                         + jnp.einsum("bkgl,bkld->bkgd",
                                      p[..., CAP:].astype(rv.dtype), rv[li],
                                      preferred_element_type=jnp.float32))
                    q = q + 1e-6 * o.astype(q.dtype)
                return (q, rk, rv), q[0, 0, 0, 0]

            (q, rk, rv), outs = jax.lax.scan(inner, (q, rk, rv),
                                             jnp.arange(K))
            # merge the block's K new positions into the big tier once
            k5 = jax.lax.dynamic_update_slice(k5, rk, (0, 0, 0, idx0, 0))
            v5 = jax.lax.dynamic_update_slice(v5, rv, (0, 0, 0, idx0, 0))
            return (q, k5, v5, idx0 + K), jnp.sum(outs)

        (q, _k, _v, _i), outs = jax.lax.scan(
            outer, (q0, ks, vs, jnp.asarray(64, jnp.int32)),
            jnp.arange(blocks))
        return jnp.sum(outs)

    arms = {"pure": run_pure, "stacked": run_stacked,
            "perlayer": run_perlayer, "tiered": run_tiered}
    for name in want:
        c, r = _time(jax.jit(arms[name]), q0, ks, vs)
        print(f"{name:9s} compile {c:6.1f}s  run {r*1e3:8.1f} ms  "
              f"{kv_bytes * REPS / r / 1e9:6.1f} GB/s  "
              f"{r / REPS * 1e3:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
