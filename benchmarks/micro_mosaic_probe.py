"""Probe the Mosaic ops the resident-decoder kernel needs, one by one.

Each probe is a minimal pallas_call exercising a single risky construct on
the real TPU (Mosaic rejects constructs at compile time, so "it compiles and
matches numpy" is the test):

  1. reshape (1, 1024) <-> (8, 128)      — lane->sublane splits for GQA heads
  2. dynamic sublane store/load           — KV cache writes at a loop index
  3. dynamic-index DMA HBM->VMEM          — audio_head / embed-row streaming
  4. argmax via iota trick                — in-kernel greedy sampling
  5. fori_loop + pl.when                  — the 32-step frame loop skeleton
  6. PRNG bits                            — Gumbel-max categorical sampling

Run: python benchmarks/micro_mosaic_probe.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def check(name, fn):
    try:
        fn()
        print(f"ok   {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def probe_reshape():
    def kernel(x_ref, o_ref):
        x = x_ref[...]                      # (1, 1024)
        h = x.reshape(8, 128) * 2.0         # lane -> sublane split
        o_ref[...] = h.reshape(1, 1024)     # and back

    x = jnp.arange(1024, dtype=jnp.float32).reshape(1, 1024)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def probe_dyn_sublane():
    def kernel(x_ref, o_ref, sc_ref):
        def body(s, _):
            sc_ref[pl.ds(s, 1), :] = x_ref[pl.ds(s, 1), :] * (s + 1).astype(
                jnp.float32)
            return 0

        jax.lax.fori_loop(0, 32, body, 0)
        o_ref[...] = sc_ref[...]

    x = jnp.ones((32, 256), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((32, 256), jnp.float32)],
    )(x)
    np.testing.assert_allclose(np.asarray(out)[:, 0],
                               np.arange(1, 33, dtype=np.float32))


def probe_dyn_dma():
    # Gather row `idx` (computed in-kernel, traced) from an HBM table.
    # NOTE: `.at[pl.ds(idx, 1), :]` with a traced idx crashes the remote
    # Mosaic compiler (HTTP 500); plain integer indexing `.at[idx]` (as used
    # by the double-buffer probe) works — so the table carries an explicit
    # (N, 1, row) layout.
    def kernel(idx_ref, tab_ref, o_ref, buf_ref, sem):
        idx = idx_ref[0] * 2 + 1            # traced scalar
        dma = pltpu.make_async_copy(tab_ref.at[idx], buf_ref, sem)
        dma.start()
        dma.wait()
        o_ref[...] = buf_ref[...]

    tab = jnp.arange(64 * 1024, dtype=jnp.float32).reshape(64, 1, 1024)
    idx = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1024), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(idx, tab)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tab[7]))


def probe_argmax():
    def kernel(x_ref, o_ref):
        x = x_ref[...]                      # (1, 2176) f32
        lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(lanes < 2051, x, -1e30)
        m = jnp.max(x, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(x == m, lanes, 2 ** 30))
        o_ref[0] = idx

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2176), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )(x)
    ref = int(np.argmax(np.asarray(x)[0, :2051]))
    assert int(out[0]) == ref, (int(out[0]), ref)


def probe_loop_when():
    def kernel(x_ref, o_ref, acc_ref, tok_ref):
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(s, _):
            @pl.when(s >= 2)
            def _():
                acc_ref[...] += x_ref[...] * s.astype(jnp.float32)

            @pl.when(s < 2)
            def _():
                tok_ref[s] = s

            return 0

        jax.lax.fori_loop(0, 8, body, 0)
        o_ref[...] = acc_ref[...]

    x = jnp.ones((1, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SMEM((8,), jnp.int32)],
    )(x)
    np.testing.assert_allclose(np.asarray(out)[0, 0], float(2 + 3 + 4 + 5 + 6 + 7))


def probe_prng():
    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        # uint32 -> f32 casts are unsupported in Mosaic: keep bits signed and
        # mask to 23 bits (non-negative) before the float convert.
        bits = pltpu.bitcast(pltpu.prng_random_bits((1, 256)), jnp.int32)
        u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
        g = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
        o_ref[...] = g

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
    )(jnp.array([42], jnp.int32))
    a = np.asarray(out)
    assert np.isfinite(a).all() and a.std() > 0.3, (a.mean(), a.std())


def probe_double_buffer():
    # Stream 4 slices of a (4, 128, 2176) bf16 HBM tensor through 2 buffers.
    def kernel(tab_ref, o_ref, buf_ref, sem):
        def mk(i, p):
            return pltpu.make_async_copy(tab_ref.at[i], buf_ref.at[p], sem.at[p])

        mk(0, 0).start()
        mk(1, 1).start()

        def body(s, acc):
            p = jax.lax.rem(s, 2)
            mk(s, p).wait()
            acc = acc + jnp.sum(buf_ref[p].astype(jnp.float32))

            @pl.when(s + 2 < 4)
            def _():
                mk(s + 2, p).start()

            return acc

        total = jax.lax.fori_loop(0, 4, body, jnp.float32(0))
        o_ref[0, 0] = total

    tab = jnp.ones((4, 128, 2176), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 128, 2176), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
    )(tab)
    assert abs(float(out[0, 0]) - 4 * 128 * 2176) < 1, float(out[0, 0])


if __name__ == "__main__":
    results = [
        check("reshape lane<->sublane", probe_reshape),
        check("dynamic sublane store", probe_dyn_sublane),
        check("dynamic-index DMA gather", probe_dyn_dma),
        check("in-kernel argmax", probe_argmax),
        check("fori_loop + pl.when", probe_loop_when),
        check("prng gumbel bits", probe_prng),
        check("double-buffered HBM stream", probe_double_buffer),
    ]
    print(f"{sum(results)}/{len(results)} probes passed")
