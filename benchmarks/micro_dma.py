"""Microbenchmark: manual double-buffered HBM->VMEM streaming in Pallas.

Decides the fused decoder-step kernel design (PERFORMANCE.md round 2):
the decoder inner loop is pure weight streaming (each of 31 steps re-reads
~107 MB of int8 weights), so the question is how close a hand-rolled
double-buffered DMA pipeline gets to the v5e HBM roofline (819 GB/s), vs.
Pallas' grid-auto-pipelining, and whether int4-packed-in-int8 codes can be
unpacked cheaply enough to halve the traffic.

Variants:
  manual{1,2,4}  manual double-buffered DMA + int8 MXU dot, 1/2/4 MB chunks
  grid           grid-pipelined (BlockSpec) equivalent (w8a8 kernel pattern)
  nibble         packed int4-in-int8, arithmetic unpack (half-split layout)
  bitcast        packed int4-in-int8, pltpu.bitcast to native int4 (if it
                 compiles on this backend)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 1024
TOTAL_ROWS = 64 * 1024          # 64 MB of int8 codes
K_LOOPS = int(os.environ.get("K_LOOPS", "120"))  # amortize ~25ms axon sync


def make_stream_fn(chunk_rows, unpack=None, packed_cols=None):
    """Returns jit(xq int8 (1,D), w (TOTAL_ROWS, cols) int8) -> (1, D) f32.

    Streams w in `chunk_rows`-row chunks through a 2-slot VMEM pipeline and
    accumulates a dot per chunk (consumes every byte, MXU int8 path).
    `unpack`: None | "nibble" | "bitcast" — for packed int4 codes where
    cols == D // 2 and each chunk expands to (chunk_rows, D).
    """
    cols = packed_cols or D
    n_chunks = TOTAL_ROWS // chunk_rows

    def kernel(xq_ref, w_hbm, out_ref):
        def body(acc_ref, scratch, sems):
            def dma(slot, idx):
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            dma(0, 0).start()
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def loop(i, carry):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    dma(jax.lax.rem(i + 1, 2), i + 1).start()

                dma(slot, i).wait()
                q = scratch[slot]
                if unpack == "nibble":
                    # half-split layout: byte j packs code[j] (low nibble,
                    # signed) and code[j + cols] (high nibble, signed).
                    c32 = q.astype(jnp.int32)
                    lo = c32 & 15
                    lo = jnp.where(lo >= 8, lo - 16, lo)
                    hi = (c32 >> 4) & 15
                    hi = jnp.where(hi >= 8, hi - 16, hi)
                    q = jnp.concatenate(
                        [lo.astype(jnp.int8), hi.astype(jnp.int8)], axis=1
                    )
                elif unpack == "bitcast":
                    q = pltpu.bitcast(q, jnp.int4).astype(jnp.int8)
                p = jax.lax.dot_general(
                    xq_ref[...], q,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (1, chunk_rows)
                acc_ref[...] += p[:, :D].astype(jnp.float32)
                return carry

            jax.lax.fori_loop(0, n_chunks, loop, 0)
            out_ref[...] = acc_ref[...]

        pl.run_scoped(
            body,
            acc_ref=pltpu.VMEM((1, D), jnp.float32),
            scratch=pltpu.VMEM((2, chunk_rows, cols), jnp.int8),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )

    @jax.jit
    def run(xq, w):
        def outer(i, carry):
            xq, acc = carry
            out = call(xq, w)
            # feed output back so the pallas_call is not loop-invariant
            xq = xq + (out[:, :D] > 0).astype(jnp.int8)
            return xq, acc + out[0, 0]

        _, acc = jax.lax.fori_loop(0, K_LOOPS, outer, (xq, jnp.float32(0)))
        return acc

    return run, call


def make_grid_fn():
    """Grid-auto-pipelined equivalent (the w8a8 kernel's streaming pattern)."""
    tile = 2048

    def kernel(xq_ref, w_ref, o_ref):
        p = jax.lax.dot_general(
            xq_ref[...], w_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[...] = p[:, :D].astype(jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(TOTAL_ROWS // tile,),
        in_specs=[
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((tile, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )

    @jax.jit
    def run(xq, w):
        def outer(i, carry):
            xq, acc = carry
            out = call(xq, w)
            xq = xq + (out[:, :D] > 0).astype(jnp.int8)
            return xq, acc + out[0, 0]

        _, acc = jax.lax.fori_loop(0, K_LOOPS, outer, (xq, jnp.float32(0)))
        return acc

    return run


def timed(fn, *args):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def report(name, compile_s, run_s, logical_bytes):
    bw = K_LOOPS * logical_bytes / run_s / 1e9
    print(f"{name:24s} compile {compile_s:6.1f}s  run {run_s*1e3:9.2f}ms  "
          f"logical-bw {bw:7.1f} GB/s", flush=True)


def main():
    only = os.environ.get("VARIANTS")
    only = only.split(",") if only else None

    def want(tag):
        return only is None or tag in only

    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 127, (1, D)), dtype=jnp.int8)
    w = jnp.asarray(rng.randint(-127, 127, (TOTAL_ROWS, D)), dtype=jnp.int8)
    full = TOTAL_ROWS * D

    for mb, rows in ((1, 1024), (2, 2048), (4, 4096)):
        if want(f"manual{mb}"):
            run, _ = make_stream_fn(rows)
            c, r = timed(run, xq, w)
            report(f"manual dma {mb}MB chunks", c, r, full)

    if want("grid"):
        run = make_grid_fn()
        c, r = timed(run, xq, w)
        report("grid pipelined 2MB", c, r, full)

    wp = jnp.asarray(rng.randint(-128, 127, (TOTAL_ROWS, D // 2)),
                     dtype=jnp.int8)
    if want("nibble"):
        run, _ = make_stream_fn(2048, unpack="nibble", packed_cols=D // 2)
        c, r = timed(run, xq, wp)
        report("nibble-unpack w4 2MB", c, r, full)  # logical = unpacked

    if want("bitcast"):
        try:
            run, _ = make_stream_fn(2048, unpack="bitcast",
                                    packed_cols=D // 2)
            c, r = timed(run, xq, wp)
            report("bitcast-int4 w4 2MB", c, r, full)
        except Exception as e:
            print(f"bitcast variant failed: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()


def make_deep_stream_fn(chunk_rows, n_slots, stripes=1, compute=True):
    """N-slot pipeline, optionally striping each chunk across `stripes`
    concurrent DMAs, optionally skipping the dot (DMA-only)."""
    cols = D
    n_chunks = TOTAL_ROWS // chunk_rows
    sub = chunk_rows // stripes

    def kernel(xq_ref, w_hbm, out_ref):
        def body(acc_ref, scratch, sems):
            def dma(slot, idx, stripe):
                r0 = idx * chunk_rows + stripe * sub
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(r0, sub), :],
                    scratch.at[slot, pl.ds(stripe * sub, sub), :],
                    sems.at[slot, stripe],
                )

            def start_all(slot, idx):
                for st in range(stripes):
                    dma(slot, idx, st).start()

            def wait_all(slot, idx):
                for st in range(stripes):
                    dma(slot, idx, st).wait()

            for k in range(n_slots - 1):
                start_all(k, k)
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def loop(i, carry):
                slot = jax.lax.rem(i, n_slots)

                @pl.when(i + n_slots - 1 < n_chunks)
                def _():
                    start_all(jax.lax.rem(i + n_slots - 1, n_slots),
                              i + n_slots - 1)

                wait_all(slot, i)
                if compute:
                    p = jax.lax.dot_general(
                        xq_ref[...], scratch[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc_ref[...] += p[:, :D].astype(jnp.float32)
                else:
                    acc_ref[...] += scratch[slot][:1, :D].astype(jnp.float32)
                return carry

            jax.lax.fori_loop(0, n_chunks, loop, 0)
            out_ref[...] = acc_ref[...]

        pl.run_scoped(
            body,
            acc_ref=pltpu.VMEM((1, D), jnp.float32),
            scratch=pltpu.VMEM((n_slots, chunk_rows, cols), jnp.int8),
            sems=pltpu.SemaphoreType.DMA((n_slots, stripes)),
        )

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )

    @jax.jit
    def run(xq, w):
        def outer(i, carry):
            xq, acc = carry
            out = call(xq, w)
            xq = xq + (out[:, :D] > 0).astype(jnp.int8)
            return xq, acc + out[0, 0]

        _, acc = jax.lax.fori_loop(0, K_LOOPS, outer, (xq, jnp.float32(0)))
        return acc

    return run


def deep_main():
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 127, (1, D)), dtype=jnp.int8)
    w = jnp.asarray(rng.randint(-127, 127, (TOTAL_ROWS, D)), dtype=jnp.int8)
    full = TOTAL_ROWS * D
    for tag, rows, slots, stripes, compute in (
        ("slots4 2MB", 2048, 4, 1, True),
        ("slots8 1MB", 1024, 8, 1, True),
        ("slots4 2MB stripe4", 2048, 4, 4, True),
        ("slots4 2MB dma-only", 2048, 4, 1, False),
        ("slots2 4MB stripe8", 4096, 2, 8, True),
    ):
        run = make_deep_stream_fn(rows, slots, stripes, compute)
        c, r = timed(run, xq, w)
        report(tag, c, r, full)


if os.environ.get("DEEP"):
    deep_main()
    raise SystemExit(0)
