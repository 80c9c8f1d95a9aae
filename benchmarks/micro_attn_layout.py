"""Decode-attention einsum cost vs KV-cache layout (B=48 serving shape).

micro_backbone_gap's `attn` arm measured the masked-einsum decode
attention at 215 GB/s effective — a third of the chip's streaming rate.
Hypothesis: the (B, n_kv, cap, d) key layout puts the contraction dim
`d` on lanes for the scores dot; a (B, n_kv, d, cap) layout would put
`cap` on lanes (natural MXU orientation) at the cost of a transposed
write at append time. Arms, each 16 layers x REPS steps in ONE jit:

  base   scores over k (cap, d): dot contracts dim 1 (current product)
  kt     scores over kt (d, cap): dot contracts dim 0, probs@v unchanged
  vt     kt + v stored (d, cap): out = vt @ probs^T
  nomask same as base without the mask add (is the +bias fusion free?)

Run on TPU: python benchmarks/micro_attn_layout.py [arm ...]
Env: LAY_B=48 LAY_CAP=640 LAY_REPS=64
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("LAY_B", "48"))
CAP = int(os.environ.get("LAY_CAP", "640"))
REPS = int(os.environ.get("LAY_REPS", "64"))
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


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    want = sys.argv[1:] or ["base", "kt", "vt", "nomask"]
    rng = np.random.RandomState(0)
    ks = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    vs = jnp.asarray(rng.randn(LAYERS, B, NKV, CAP, HD), jnp.bfloat16)
    kts = jnp.swapaxes(ks, 3, 4)  # (L, B, NKV, HD, CAP)
    vts = jnp.swapaxes(vs, 3, 4)
    q0 = jnp.asarray(rng.randn(B, NKV, GROUP, HD), jnp.bfloat16)
    pad = jnp.asarray(rng.randint(0, 64, (B,)), jnp.int32)
    kv_bytes = LAYERS * 2 * B * NKV * CAP * HD * 2

    def mask_for(idx):
        kpos = jnp.arange(CAP, dtype=jnp.int32)
        ok = (kpos[None] >= pad[:, None]) & (kpos[None] <= idx)
        return jnp.where(ok, 0.0, NEG).astype(jnp.float32)[:, None, None]

    def chain(step):
        def f(q0, ks, vs):
            def body(carry, i):
                q = carry
                m = mask_for(64 + (i % 32))
                for li in range(LAYERS):
                    o = step(q, ks[li], vs[li], m)  # (B, NKV, GROUP, HD)
                    q = q + 1e-6 * o.astype(q.dtype)
                return q, q[0, 0, 0, 0]

            q, outs = jax.lax.scan(body, q0, jnp.arange(REPS))
            return jnp.sum(outs)
        return jax.jit(f)

    def base_step(q, k, v, m):
        logits = jnp.einsum("bkgd,bkld->bkgl", q, k,
                            preferred_element_type=jnp.float32) + m
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bkgl,bkld->bkgd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    def kt_step(q, kt, v, m):
        logits = jnp.einsum("bkgd,bkdl->bkgl", q, kt,
                            preferred_element_type=jnp.float32) + m
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bkgl,bkld->bkgd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    def vt_step(q, kt, vt, m):
        logits = jnp.einsum("bkgd,bkdl->bkgl", q, kt,
                            preferred_element_type=jnp.float32) + m
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bkgl,bkdl->bkgd", p.astype(vt.dtype), vt,
                          preferred_element_type=jnp.float32)

    def nomask_step(q, k, v, m):
        logits = jnp.einsum("bkgd,bkld->bkgl", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bkgl,bkld->bkgd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    arms = {"base": (base_step, ks, vs), "kt": (kt_step, kts, vs),
            "vt": (vt_step, kts, vts), "nomask": (nomask_step, ks, vs)}
    for name in want:
        step, ka, va = arms[name]
        c, r = _time(chain(step), q0, ka, va)
        print(f"{name:7s} compile {c:6.1f}s  run {r*1e3:8.1f} ms  "
              f"{kv_bytes * REPS / r / 1e9:6.1f} GB/s  "
              f"{r / REPS * 1e3:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
