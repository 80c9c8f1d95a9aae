"""A/B the round-4 resident-kernel variants on TPU, interleaved in ONE process.

The round-3 frame budget (PERFORMANCE.md) pinned single-stream as
DECODER-phase-bound: 1.86 ms of the 3.56 ms frame is the resident kernel —
~1.4 ms of 31-step serial latency (~1200 sequential MXU dots at b=1) plus a
~0.2-0.45 ms per-frame VMEM weight load. The round-4 variants attack both:

- vpu_rope:     RoPE as VPU rolls/FMAs instead of 2 MXU dots/layer-step
                (-248 serial dots/frame)
- merged_attn:  1 score + 1 AV dot per layer-step instead of 2 per kv-group
                (-248 serial dots/frame at n_kv=2)
- dma_weights:  manual per-layer weight DMA so step-0 compute starts after
                layer 0's ~26 MB instead of the full ~106 MB prologue

Each arm chains FRAMES whole frames inside one jitted program (carrying a
data dependency through the sampled tokens so XLA cannot hoist or overlap
frames), and all arms run interleaved A/B/A/B in one process — the only
methodology that survives the shared chip's drift (CLAUDE.md). A load-probe
arm times just the Pallas prologue copy of the same 106 MB weight set to
attribute the dma_weights delta.

Run: python benchmarks/resident_v2_ab.py
Env: FRAMES=32 ROUNDS=5 AB_B=1 ARMS=classic,vpu_rope,...  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.ops.resident_decoder import (
        prepare_resident_decoder,
        resident_decode_frame,
    )

    FRAMES = int(os.environ.get("FRAMES", "32"))
    ROUNDS = int(os.environ.get("ROUNDS", "5"))
    B = int(os.environ.get("AB_B", "1"))

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = (
        jax.random.normal(jax.random.PRNGKey(7),
                          model.params["audio_head"].shape)
        * (model.args.decoder_dim ** -0.5)
    ).astype(jnp.bfloat16)
    quantize_model(model, mode="w8a8")
    assert prepare_resident_decoder(model)
    res = model.params["_resident"]
    args = model.args
    d = args.decoder_config.hidden_size

    base = jax.random.normal(jax.random.PRNGKey(3), (2, B, d),
                             jnp.float32) * 0.3
    seed = jnp.zeros((1,), jnp.int32)

    def make_arm(opts_str):
        """Build + warm a FRAMES-frame chained program under these opts."""
        old = os.environ.get("CSM_TPU_RESIDENT_OPTS")
        os.environ["CSM_TPU_RESIDENT_OPTS"] = opts_str

        @jax.jit
        def run_(r, p0):
            # r (the weight tables) rides as an ARGUMENT: closing over it
            # would embed >400 MB of constants in the program and blow the
            # remote compiler's request-size limit.
            def body(i, p):
                toks = resident_decode_frame(r, args, p, seed, 0.0)
                # serialize frames: next input depends on this frame's tokens
                return p * (1.0 + 1e-9 * jnp.sum(toks).astype(jnp.float32))
            return jax.lax.fori_loop(0, FRAMES, body, p0)

        run = lambda p0: run_(res, p0)
        jax.device_get(run(base))  # trace (env read here) + compile + warm
        if old is None:
            os.environ.pop("CSM_TPU_RESIDENT_OPTS", None)
        else:
            os.environ["CSM_TPU_RESIDENT_OPTS"] = old
        return run

    def make_load_probe():
        """Time the Pallas prologue load of the same big-weight set: body
        touches each array (sums one row) so nothing is pruned, chained with
        a carry so the calls cannot be hoisted out of the frame loop."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bigw = []
        for lw in res["layers"]:
            bigw += [lw[1], lw[3], lw[6], lw[8]]  # qkv_q, o_q, gu_q, dn_q
        n = len(bigw)

        def kernel(*refs):
            carry = refs[0]
            out = refs[n + 1]
            acc = carry[...].astype(jnp.float32)
            for j in range(1, n + 1):
                acc = acc + jnp.sum(
                    refs[j][0:1, :].astype(jnp.float32), axis=1,
                    keepdims=True)
            out[...] = acc

        call = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n + 1),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )

        @jax.jit
        def run_(ws, c0):
            def body(i, c):
                return call(c, *ws)
            return jax.lax.fori_loop(0, FRAMES, body, c0)

        run = lambda c0: run_(bigw, c0)
        jax.device_get(run(jnp.zeros((1, 1), jnp.float32)))
        return run

    arm_names = os.environ.get(
        "ARMS",
        "classic,vpu_rope,merged_attn,dma_weights,"
        "vpu_rope+merged_attn,default").split(",")
    DEFAULT_OPTS = "vpu_rope,merged_attn,dma_weights"
    arms = {}
    for name in arm_names:
        if name == "default":
            opts = ""          # _kernel_opts default (all, merged at b<=8)
        else:
            # "default+probe_x" -> the production variant set plus a probe
            opts = name.replace("default", DEFAULT_OPTS).replace("+", ",")
        t0 = time.perf_counter()
        arms[name] = make_arm(opts)
        print(f"built arm {name!r} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    t0 = time.perf_counter()
    arms["load_probe"] = make_load_probe()
    print(f"built arm 'load_probe' in {time.perf_counter() - t0:.1f}s",
          flush=True)

    results = {k: [] for k in arms}
    for r in range(ROUNDS):
        for name, fn in arms.items():
            a = (base if name != "load_probe"
                 else jnp.zeros((1, 1), jnp.float32))
            t0 = time.perf_counter()
            jax.device_get(fn(a))
            dt = (time.perf_counter() - t0) / FRAMES * 1e3
            results[name].append(dt)
        print(f"round {r}: " + "  ".join(
            f"{k}={results[k][-1]:.2f}" for k in arms), flush=True)

    print(f"\nB={B}, {FRAMES} frames/program, ms/frame (best | median):")
    ref = None
    for name in arms:
        vals = sorted(results[name])
        best, med = vals[0], vals[len(vals) // 2]
        if name == "classic":
            ref = med
        ratio = f"  {ref / med:.3f}x vs classic" if (
            ref and name != "classic") else ""
        print(f"  {name:22s} {best:6.2f} | {med:6.2f}{ratio}")


if __name__ == "__main__":
    main()
