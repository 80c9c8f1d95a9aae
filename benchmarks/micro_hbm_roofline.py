"""Where does the v5e's 819 GB/s nominal HBM bandwidth go? (VERDICT r2 #1)

The backbone decode step streams 0.97 GB of int8 weights at an effective
~300 GB/s (3.2 ms/step). This probe measures the best achievable read rate
for each data path on THIS chip, with every variant chained inside one long
jit program (standalone micros run ~9x slower on the shared chip —
PERFORMANCE.md) and made loop-variant so XLA cannot hoist the reads:

  xla_dot_int8    y += W_i8 @ x_k     (XLA int8 matvec — the non-Pallas path)
  xla_dot_bf16    y += W_bf16 @ x_k   (the round-2 "324-550 GB/s" row)
  xla_red_int8    y += sum(W_i8 * m_k)  (pure streaming reduce, int8 tiling)
  xla_red_int32   y += sum(W_i32 * m_k) (same bytes, int32 (8,128) tiling)
  xla_red_bf16    y += sum(W_bf16 * m_k)
  w8a8_kernel     the production Pallas W8A8 matvec (ops/quant.py), per-layer
  w8a8_tile=N     same kernel with tile_out forced to N

Each arm reads N_ARRAYS x 64 MB per rep, REPS times, in ONE jit program.
Layout mimics the fused backbone: (rows, 8192). Run on TPU:
  python benchmarks/micro_hbm_roofline.py [arm ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ARRAYS = int(os.environ.get("ROOFLINE_ARRAYS", "8"))
ROWS = int(os.environ.get("ROOFLINE_ROWS", "8192"))
COLS = int(os.environ.get("ROOFLINE_COLS", "8192"))
REPS = int(os.environ.get("ROOFLINE_REPS", "8"))


def _time(fn, *args):
    # time with device_get: block_until_ready is lazy under the axon tunnel
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    jax.device_get(jfn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def report(name, compile_s, run_s, bytes_per_rep):
    bw = bytes_per_rep * REPS / run_s / 1e9
    print(f"{name:18s} compile {compile_s:6.1f}s  run {run_s*1e3:8.1f} ms  "
          f"{bw:7.1f} GB/s", flush=True)


def main():
    want = sys.argv[1:] or ["xla_dot_int8", "xla_dot_bf16", "xla_red_int8",
                            "xla_red_int32", "xla_red_bf16", "w8a8_kernel"]
    key = jax.random.PRNGKey(0)
    bytes_per_rep = N_ARRAYS * ROWS * COLS  # int8 bytes; scaled per dtype

    def arrays(dtype, cols=COLS):
        if dtype == jnp.int8:
            return [jnp.asarray(
                np.random.RandomState(i).randint(-127, 127, (ROWS, cols)),
                jnp.int8) for i in range(N_ARRAYS)]
        if dtype == jnp.int32:
            return [jnp.asarray(
                np.random.RandomState(i).randint(-2**30, 2**30, (ROWS, cols)),
                jnp.int32) for i in range(N_ARRAYS)]
        return [jax.random.normal(jax.random.fold_in(key, i),
                                  (ROWS, cols), jnp.float32).astype(dtype)
                for i in range(N_ARRAYS)]

    if "xla_dot_int8" in want:
        ws = arrays(jnp.int8)

        def f(ws, xs):
            def body(k, acc):
                x = jax.lax.dynamic_index_in_dim(xs, k % 16, keepdims=False)
                for w in ws:
                    acc += jax.lax.dot_general(
                        x[None], w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)[0]
                return acc
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((ROWS,), jnp.int32))

        xs = jnp.asarray(np.random.RandomState(99).randint(
            -127, 127, (16, COLS)), jnp.int8)
        c, r = _time(f, ws, xs)
        report("xla_dot_int8", c, r, bytes_per_rep)

    if "xla_dot_bf16" in want:
        ws = arrays(jnp.bfloat16)

        def f(ws, xs):
            def body(k, acc):
                x = jax.lax.dynamic_index_in_dim(xs, k % 16, keepdims=False)
                for w in ws:
                    acc += jax.lax.dot_general(
                        x[None], w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)[0]
                return acc
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((ROWS,), jnp.float32))

        xs = jax.random.normal(key, (16, COLS), jnp.float32).astype(jnp.bfloat16)
        c, r = _time(f, ws, xs)
        report("xla_dot_bf16", c, r, bytes_per_rep * 2)

    for name, dtype, itemsize in (("xla_red_int8", jnp.int8, 1),
                                  ("xla_red_int32", jnp.int32, 4),
                                  ("xla_red_bf16", jnp.bfloat16, 2)):
        if name not in want:
            continue
        cols = COLS // itemsize  # same BYTES per array across dtypes
        ws = arrays(dtype, cols)

        def f(ws, ms):
            def body(k, acc):
                m = jax.lax.dynamic_index_in_dim(ms, k % 16, keepdims=False)
                for w in ws:
                    if w.dtype == jnp.int8 or w.dtype == jnp.int32:
                        acc += jnp.sum(w.astype(jnp.int32) * m).astype(
                            jnp.float32)
                    else:
                        acc += jnp.sum(w.astype(jnp.float32) * m)
                return acc
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        ms = (jnp.arange(16) % 3 + 1).astype(
            jnp.int32 if itemsize != 2 else jnp.float32)
        c, r = _time(f, ws, ms)
        report(name, c, r, bytes_per_rep)

    w8a8_tiles = [int(a.split("=")[1]) for a in want if a.startswith("w8a8_tile=")]
    if "w8a8_kernel" in want or w8a8_tiles:
        from csm_mlx_tpu.ops import quant as q

        ws = arrays(jnp.int8)
        scales = [jnp.ones((ROWS, 1), jnp.float32) for _ in range(N_ARRAYS)]
        biases = [jnp.zeros((ROWS, 1), jnp.float32) for _ in range(N_ARRAYS)]

        def make(tile):
            orig = None

            def f(ws, scales, biases, xs):
                def body(k, acc):
                    x = jax.lax.dynamic_index_in_dim(xs, k % 16,
                                                     keepdims=False)[None]
                    for w, s, z in zip(ws, scales, biases):
                        acc += q._pallas_quant_matvec_w8a8(
                            x.astype(jnp.bfloat16), w, s, z,
                            bits=8, group_size=COLS)[0]
                    return acc
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((ROWS,), jnp.bfloat16))
            return f

        xs = jax.random.normal(key, (16, COLS), jnp.float32)
        if "w8a8_kernel" in want:
            c, r = _time(make(None), ws, scales, biases, xs)
            report("w8a8_kernel", c, r, bytes_per_rep)


if __name__ == "__main__":
    main()
