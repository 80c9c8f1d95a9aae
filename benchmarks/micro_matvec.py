"""Microbenchmark: decode-time matvec variants on TPU.

Measures effective HBM bandwidth for the bandwidth-bound decode matmuls.
The chain is *sequentially dependent* (y_{i+1} = g(y_i @ W_i)) so XLA cannot
algebraically collapse the weight reads — this mirrors the real decoder
inner loop.

Variants:
  1. bf16 weights, python-unrolled
  2. bf16 weights, lax.scan over stacked (tests scan-slice copies)
  3. int8 weights, XLA dequant (tests convert-fusion)
  4. int8 weights, Pallas dequant-matmul
  5. int4 (native uint4) weights, Pallas dequant-matmul
  6. int8 Pallas inside lax.scan (one call site)
"""

import sys
sys.setrecursionlimit(100000)
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from csm_mlx_tpu.ops.quant import _pallas_quant_matvec, quantize_weight

D = 2048
REPS = 64
GROUP = int(__import__("os").environ.get("GROUP", "128"))


def timed(fn, *args):
    t0 = time.perf_counter()
    out = jax.device_get(fn(*args))  # block_until_ready may be lazy on axon
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = jax.device_get(fn(*args))
    run_s = (time.perf_counter() - t0) / n
    return compile_s, run_s


def report(name, compile_s, run_s, bytes_per_rep):
    bw = K_LOOPS * REPS * bytes_per_rep / run_s / 1e9
    print(f"{name:28s} compile {compile_s:7.2f}s  run {run_s*1e3:8.3f}ms  "
          f"eff-bw {bw:7.1f} GB/s", flush=True)


K_LOOPS = 60  # amortize the ~25ms axon sync latency


def chain(step):
    def fn(x, *wargs):
        def outer(_, y):
            for i in range(REPS):
                y = jnp.tanh(step(y, i, *wargs)) + x
            return y
        return jax.lax.fori_loop(0, K_LOOPS, outer, x)
    return jax.jit(fn)


def main():
    import os
    only = os.environ.get("VARIANTS", "").split(",") if os.environ.get("VARIANTS") else None

    def want(tag):
        return only is None or tag in only

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, D).astype(np.float32), dtype=jnp.bfloat16)
    ws = jnp.asarray(rng.randn(REPS, D, D).astype(np.float32) * 0.02,
                     dtype=jnp.bfloat16)

    if want("bf16"):
        f = chain(lambda y, i, ws: jnp.einsum(
            "bi,oi->bo", y, ws[i], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16))
        c, r = timed(f, x, ws)
        report("bf16 unrolled", c, r, D * D * 2)

    @jax.jit
    def bf16_scan(x, ws):
        def body(y, w):
            y = jnp.tanh(jnp.einsum("bi,oi->bo", y, w,
                                    preferred_element_type=jnp.float32)
                         ).astype(jnp.bfloat16) + x
            return y, None
        def outer(_, y):
            y2, _ = jax.lax.scan(body, y, ws)
            return y2
        return jax.lax.fori_loop(0, K_LOOPS, outer, x)

    if want("bf16scan"):
        c, r = timed(bf16_scan, x, ws)
        report("bf16 lax.scan stacked", c, r, D * D * 2)

    import functools
    qall = jax.jit(jax.vmap(functools.partial(quantize_weight, bits=8,
                                              group_size=GROUP)))(ws)
    q8, s8, z8 = qall["weight_q"], qall["scales"], qall["biases"]

    if want("int8xla"):
        f = chain(lambda y, i, q8, s8, z8: _xla_step(y, q8[i], s8[i], z8[i]))
        c, r = timed(f, x, q8, s8, z8)
        report("int8 XLA dequant", c, r, D * D)

    if want("int8pl"):
        f = chain(lambda y, i, q8, s8, z8: _pallas_quant_matvec(
            y, q8[i], s8[i], z8[i], bits=8, group_size=GROUP))
        c, r = timed(f, x, q8, s8, z8)
        report("int8 pallas", c, r, D * D)

    if not want("int4pl"):
        return
    q4all = jax.jit(jax.vmap(functools.partial(quantize_weight, bits=4,
                                               group_size=GROUP)))(ws)
    q4, s4, z4 = q4all["weight_q"], q4all["scales"], q4all["biases"]

    f = chain(lambda y, i, q4, s4, z4: _pallas_quant_matvec(
        y, q4[i], s4[i], z4[i], bits=4, group_size=GROUP))
    c, r = timed(f, x, q4, s4, z4)
    report("int4 pallas (native uint4)", c, r, D * D // 2)

    @jax.jit
    def int8_pallas_scan(x, q8, s8, z8):
        def body(y, qsz):
            q, s, z = qsz
            y = jnp.tanh(_pallas_quant_matvec(y, q, s, z, bits=8,
                                              group_size=GROUP)) + x
            return y, None
        def outer(_, y):
            y2, _ = jax.lax.scan(body, y, (q8, s8, z8))
            return y2
        return jax.lax.fori_loop(0, K_LOOPS, outer, x)

    c, r = timed(int8_pallas_scan, x, q8, s8, z8)
    report("int8 pallas lax.scan", c, r, D * D)


def _xla_step(y, q, s, z):
    qf = q.astype(jnp.float32).reshape(D, D // GROUP, GROUP)
    w = (qf * s[..., None] + z[..., None]).reshape(D, D)
    return jnp.einsum("bi,oi->bo", y, w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


if __name__ == "__main__":
    main()


def w8a8_main():
    from csm_mlx_tpu.ops.quant import (_pallas_quant_matvec_w8a8,
                                       quantize_weight_w8)
    import functools

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, D).astype(np.float32), dtype=jnp.bfloat16)
    ws = jnp.asarray(rng.randn(REPS, D, D).astype(np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    bits = int(__import__("os").environ.get("W8A8_BITS", "8"))
    qall = jax.jit(jax.vmap(functools.partial(quantize_weight_w8,
                                              bits=bits)))(ws)
    q8, s8, z8 = qall["weight_q"], qall["scales"], qall["biases"]

    f = chain(lambda y, i, q8, s8, z8: _pallas_quant_matvec_w8a8(
        y, q8[i], s8[i], z8[i], bits=8, group_size=D))
    c, r = timed(f, x, q8, s8, z8)
    report(f"int{bits} W{bits}A8 MXU pallas", c, r,
           D * D if bits == 8 else D * D // 2)

    # numeric sanity vs dequantized reference
    w0 = (q8[0].astype(jnp.float32) * s8[0] + z8[0])
    want = np.asarray(x.astype(jnp.float32) @ w0.T)
    got = np.asarray(_pallas_quant_matvec_w8a8(x, q8[0], s8[0], z8[0],
                                               bits=8, group_size=D))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"w8a8 rel err vs dequant ref: {rel:.4f}")


if __import__("os").environ.get("VARIANTS") == "w8a8":
    w8a8_main()
    raise SystemExit(0)
