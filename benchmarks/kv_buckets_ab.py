"""Bucketed decode attention A/B at serving shapes (one process).

The continuous engine's backbone step reads the ENTIRE static KV buffer
every step: at B=48 x capacity 1890 (the production default:
max_prompt_bucket 512 + max_frames 1250 + slack 128) that is ~3 GB of
dead-tail HBM reads per step — more than the backbone weights
(micro_backbone_gap.py GAP_B=48: step 6.3 ms vs 1.9 ms for the weight
stream alone). ops/attention.py::bucketed_sdpa switches over static
prefix slices so only the live bucket is read.

Both arms build the REAL generation._backbone_step chained in one jit
(long-program methodology), differing only in the static kv_len
(AB_KVLEN vs full capacity), and run interleaved A/B/A/B in one process
(shared-chip drift discipline, CLAUDE.md).

History: the first version of this optimization was a traced-length
`lax.switch` over prefix slices — it measured 1.4x SLOWER than the full
read (14.0 vs 10.1 ms/step) because XLA conditionals copy the big K/V
operands every step. The static-bucket design this file now measures is
what shipped.

Run on TPU: python benchmarks/kv_buckets_ab.py
Env: AB_B=48 AB_CAP=1890 AB_INDEX=512 AB_KVLEN=768 AB_REPS=64 AB_ROUNDS=3
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("AB_B", "48"))
CAP = int(os.environ.get("AB_CAP", "1890"))
INDEX = int(os.environ.get("AB_INDEX", "512"))
KVLEN = int(os.environ.get("AB_KVLEN", "768"))
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

    def build(cache0, kv_len):
        """Trace AND compile (jax.jit is lazy) the chained-step program
        with the given static attention prefix (None = full capacity)."""

        def f(params, cache):
            frame0 = jnp.ones((B, args_m.n_audio_codebooks), jnp.int32)

            def body(carry, _):
                frame, cache = carry
                tokens, mask = _frame_to_next_input(frame)
                hidden, cache = _backbone_step(
                    params, args_m, tokens, mask, pad, cache, cos_b, sin_b,
                    kv_len=kv_len)
                frame = (frame + hidden[:, :32].astype(jnp.int32) % 3) % 2051
                return (frame, cache), hidden[0, 0]

            (_f, cache), hs = jax.lax.scan(
                body, (frame0, cache), None, length=REPS)
            return jnp.sum(hs)

        return jax.jit(f).lower(model.params, cache0).compile()

    cache0 = KVCache.init(bcfg, B, CAP, dtype=jnp.bfloat16)
    cache0 = dataclasses.replace(cache0, index=jnp.asarray(INDEX, jnp.int32))

    print("# compiling both arms...", file=sys.stderr, flush=True)
    f_on = build(cache0, KVLEN)
    f_off = build(cache0, None)

    def run(fn):
        t0 = time.perf_counter()
        jax.device_get(fn(model.params, cache0))
        return time.perf_counter() - t0

    print("# warmup (compiles)...", file=sys.stderr, flush=True)
    run(f_on), run(f_off)

    best = {"on": float("inf"), "off": float("inf")}
    for r in range(ROUNDS):
        for name, fn in (("on", f_on), ("off", f_off)):
            dt = run(fn) / REPS * 1e3
            best[name] = min(best[name], dt)
            print(f"# round {r} buckets={name:3s} {dt:6.3f} ms/step",
                  file=sys.stderr, flush=True)

    ratio = best["off"] / best["on"]
    print(jax.tree.map(lambda x: x, {
        "metric": "kv_buckets_backbone_step",
        "value": round(best["on"], 3), "unit": "ms_per_step",
        "vs_baseline": round(ratio, 3),
        "off_ms": round(best["off"], 3), "on_ms": round(best["on"], 3),
        "B": B, "capacity": CAP, "index": INDEX, "kv_len": KVLEN}))


if __name__ == "__main__":
    main()
