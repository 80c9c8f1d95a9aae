"""Microbenchmark: whole-frame VMEM-resident decoder loop in ONE Pallas call.

Question (PERFORMANCE.md round-2 follow-up): the production decoder phase
costs ~3.6 ms/frame ~= 496 dots x 7.2 us fixed dispatch cost — it is
dispatch-bound, not bandwidth-bound. A single kernel that (a) loads all
4 decoder layers' int8 weights into VMEM once (~106 MB; the chip holds
>=120 MB, probed) and (b) runs all 31 token-steps inside one
`lax.fori_loop`, pays ONE dispatch + one weight load per frame instead of
496 dispatches. This micro measures the matvec chain only (no attention /
sampling / audio_head) to bound the win before building the full kernel.

ANSWER (measured, FRAMES=20): resident 2.78 ms/frame vs dispatched
4.48 ms/frame — 1.61x. Short standalone programs had masked this (both
paths read ~9x slower than in-situ; shared-chip duty-cycle artifact), so
per-frame cost must be measured with many frames chained in ONE program.
The production kernel built on this finding is ops/resident_decoder.py
(end-to-end RTF 10.9 -> 17.8).

Run on TPU: python benchmarks/micro_resident_decoder.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

D, QKV, FFN = 1024, 1536, 8192
N_LAYERS, N_STEPS = 4, 31


def make_weights(seed=0):
    rng = np.random.RandomState(seed)
    layers = []
    for _ in range(N_LAYERS):
        layers.append({
            "qkv": rng.randint(-127, 128, (QKV, D)).astype(np.int8),
            "o": rng.randint(-127, 128, (D, D)).astype(np.int8),
            "gu": rng.randint(-127, 128, (2 * FFN, D)).astype(np.int8),
            "down": rng.randint(-127, 128, (D, FFN)).astype(np.int8),
            "s_qkv": (rng.rand(1, QKV).astype(np.float32) + 0.5) * 1e-4,
            "s_o": (rng.rand(1, D).astype(np.float32) + 0.5) * 1e-4,
            "s_gu": (rng.rand(1, 2 * FFN).astype(np.float32) + 0.5) * 1e-4,
            "s_down": (rng.rand(1, D).astype(np.float32) + 0.5) * 1e-4,
        })
    return layers


def resident_kernel(layers):
    """One pallas_call: weights pinned in VMEM, 31 steps inside."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in = 1 + 8 * N_LAYERS  # x + (4 weights + 4 scales) per layer

    def kernel(*refs):
        x_ref = refs[0]
        o_ref = refs[n_in]

        def mv(xf, q_ref, s_ref):
            absmax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
            xs = 127.0 / absmax
            xq = jnp.clip(jnp.round(xf * xs), -127, 127).astype(jnp.int8)
            p = jax.lax.dot_general(
                xq, q_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return p.astype(jnp.float32) * s_ref[...] * (1.0 / xs)

        def step(_, x):
            for li in range(N_LAYERS):
                base = 1 + 8 * li
                (qkv, s_qkv, o, s_o, gu, s_gu,
                 down, s_down) = refs[base:base + 8]
                a = mv(x, qkv, s_qkv)[:, :D]
                b = mv(a, o, s_o)
                g = mv(b, gu, s_gu)
                h = g[:, :FFN] * jax.nn.sigmoid(g[:, FFN:])
                x = mv(h, down, s_down)
            return x

        o_ref[...] = jax.lax.fori_loop(0, N_STEPS, step, x_ref[...])

    args = [jnp.zeros((1, D), jnp.float32)]
    for l in layers:
        for k in ("qkv", "o", "gu", "down"):
            args.append(jnp.asarray(l[k]))
            args.append(jnp.asarray(l["s_" + k]))

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return fn, args


def dispatched_chain(layers):
    """The production shape: one W8A8 pallas_call per matvec, 31 steps
    unrolled under jit (lets XLA pipeline weight streaming across steps)."""
    import sys
    sys.path.insert(0, ".")
    from csm_mlx_tpu.ops.quant import _pallas_quant_matvec_w8a8

    weights = [
        {k: jnp.asarray(l[k]) for k in ("qkv", "o", "gu", "down")} |
        {("s_" + k): jnp.asarray(l["s_" + k]).reshape(-1, 1)
         for k in ("qkv", "o", "gu", "down")}
        for l in layers
    ]
    @jax.jit
    def run(x):
        for _ in range(N_STEPS):
            for w in weights:
                a = _pallas_quant_matvec_w8a8(
                    x, w["qkv"], w["s_qkv"], jnp.zeros_like(w["s_qkv"]),
                    bits=8, group_size=D)[:, :D]
                b = _pallas_quant_matvec_w8a8(
                    a, w["o"], w["s_o"], jnp.zeros_like(w["s_o"]),
                    bits=8, group_size=D)
                g = _pallas_quant_matvec_w8a8(
                    b, w["gu"], w["s_gu"], jnp.zeros_like(w["s_gu"]),
                    bits=8, group_size=D)
                h = g[:, :FFN] * jax.nn.sigmoid(g[:, FFN:])
                x = _pallas_quant_matvec_w8a8(
                    h, w["down"], w["s_down"], jnp.zeros_like(w["s_down"]),
                    bits=8, group_size=FFN)
        return x

    return run


def bench(fn, args, reps=5, label="", frames=1):
    out = fn(*args)
    jax.device_get(out)  # compile + first exec
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_frame = best / frames
    print(f"{label}: best {best*1e3:.2f} ms total, "
          f"{per_frame*1e3:.2f} ms/frame "
          f"({per_frame*1e6/N_STEPS:.1f} us/step)")
    return per_frame


if __name__ == "__main__":
    import os

    # Short standalone programs on the shared chip can read ~9x slower than
    # the same code inside bench.py's 873 ms program (duty-cycle artifact,
    # session r2). FRAMES>1 chains many whole frames inside ONE jitted
    # program so per-frame cost is measured at a realistic program length.
    FRAMES = int(os.environ.get("FRAMES", "20"))

    layers = make_weights()
    total_mb = sum(l[k].nbytes for l in layers
                   for k in ("qkv", "o", "gu", "down")) / 2**20
    print(f"weights: {total_mb:.1f} MB int8 "
          f"({N_LAYERS} layers x {N_STEPS} steps), "
          f"{FRAMES} frames per program")

    fn, args = resident_kernel(layers)

    @jax.jit
    def run_res(*a):
        return jax.lax.fori_loop(
            0, FRAMES, lambda _, x: fn(x, *a[1:]), a[0])

    t_res = bench(run_res, args, label="resident (1 pallas_call/frame)",
                  frames=FRAMES)

    frame = dispatched_chain(layers)

    @jax.jit
    def run_disp(x):
        return jax.lax.fori_loop(0, FRAMES, lambda _, y: frame(y), x)

    x0 = jnp.zeros((1, D), jnp.float32)
    t_disp = bench(run_disp, [x0], label="dispatched (496 calls/frame)",
                   frames=FRAMES)
    print(f"speedup: {t_disp / t_res:.2f}x")
