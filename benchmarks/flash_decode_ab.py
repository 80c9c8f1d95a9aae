"""Flash-decode attention A/B at serving shapes (one process).

micro_backbone_gap.py's `attn` arm showed the masked-einsum decode
attention costs ~4.7 ms/step at B=48 x cap 640 — mostly FIXED overhead
(384 tiny batched GEMVs + HBM-materialized fp32 logits/probs), not KV
bytes (215 GB/s effective vs the chip's ~620). ops/attention.py::
flash_decode_sdpa runs one Pallas program per batch row with the
(group, cap) logits tile resident in VMEM.

Both arms chain the REAL generation._backbone_step (long-program
methodology), differing only in CSM_TPU_FLASH_DECODE at trace time, and
run interleaved A/B/A/B in one process.

Run on TPU: python benchmarks/flash_decode_ab.py
Env: AB_B=48 AB_CAP=768 AB_INDEX=512 AB_REPS=64 AB_ROUNDS=3
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("AB_B", "48"))
CAP = int(os.environ.get("AB_CAP", "768"))
INDEX = int(os.environ.get("AB_INDEX", "512"))
REPS = int(os.environ.get("AB_REPS", "64"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main():
    import dataclasses

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from csm_mlx_tpu.generation import _backbone_step, _frame_to_next_input
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.kv_cache import KVCache
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.ops.rope import rope_cache_for

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    quantize_model(model, mode="w8a8")
    args_m = model.args
    bcfg = args_m.backbone_config
    cos_b, sin_b = rope_cache_for(bcfg, max(CAP,
                                            bcfg.max_position_embeddings))
    pad = jnp.zeros((B,), jnp.int32)

    def build(cache0):
        """Trace AND compile under the CURRENT env (jax.jit is lazy)."""

        def f(params, cache):
            frame0 = jnp.ones((B, args_m.n_audio_codebooks), jnp.int32)

            def body(carry, _):
                frame, cache = carry
                tokens, mask = _frame_to_next_input(frame)
                hidden, cache = _backbone_step(
                    params, args_m, tokens, mask, pad, cache, cos_b, sin_b)
                frame = (frame + hidden[:, :32].astype(jnp.int32) % 3) % 2051
                return (frame, cache), hidden[0, 0]

            (_f, cache), hs = jax.lax.scan(
                body, (frame0, cache), None, length=REPS)
            return jnp.sum(hs)

        return jax.jit(f).lower(model.params, cache0).compile()

    cache0 = KVCache.init(bcfg, B, CAP, dtype=jnp.bfloat16)
    cache0 = dataclasses.replace(cache0, index=jnp.asarray(INDEX, jnp.int32))

    print("# compiling both arms...", file=sys.stderr, flush=True)
    os.environ["CSM_TPU_FLASH_DECODE"] = "1"
    f_on = build(cache0)
    os.environ["CSM_TPU_FLASH_DECODE"] = "0"
    f_off = build(cache0)

    def run(fn):
        t0 = time.perf_counter()
        jax.device_get(fn(model.params, cache0))
        return time.perf_counter() - t0

    print("# warmup...", file=sys.stderr, flush=True)
    run(f_on), run(f_off)

    best = {"on": float("inf"), "off": float("inf")}
    for r in range(ROUNDS):
        for name, fn in (("on", f_on), ("off", f_off)):
            dt = run(fn) / REPS * 1e3
            best[name] = min(best[name], dt)
            print(f"# round {r} flash_decode={name:3s} {dt:6.3f} ms/step",
                  file=sys.stderr, flush=True)

    ratio = best["off"] / best["on"]
    print({"metric": "flash_decode_backbone_step",
           "value": round(best["on"], 3), "unit": "ms_per_step",
           "vs_baseline": round(ratio, 3),
           "off_ms": round(best["off"], 3), "on_ms": round(best["on"], 3),
           "B": B, "capacity": CAP, "index": INDEX})


if __name__ == "__main__":
    main()
