"""Interleaved A/B: continuous-service throughput vs engine slot count.

The shared TPU's throughput drifts up to 3x between processes (CLAUDE.md),
so per-process sweeps of `n_slots` are unreadable — a single config swings
78-163x across runs. This bench builds BOTH engines in one process, warms
both on the full workload, then alternates timed passes A/B/A/B so every
pair shares the chip's current duty cycle. Report the per-round ratio.

Run: python benchmarks/slots_ab.py
Env: SLOTS_A=16 SLOTS_B=48 N_REQUESTS=96 SECONDS=5 ROUNDS=3
"""

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    from csm_mlx_tpu.continuous import ContinuousEngine
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model

    slots_a = int(os.environ.get("SLOTS_A", "16"))
    slots_b = int(os.environ.get("SLOTS_B", "48"))
    fps_a = int(os.environ.get("FPS_A", "8"))
    fps_b = int(os.environ.get("FPS_B", "8"))
    transfer_a = os.environ.get("TRANSFER_A", "float32")
    transfer_b = os.environ.get("TRANSFER_B", "float32")
    n_requests = int(os.environ.get("N_REQUESTS", "96"))
    seconds = float(os.environ.get("SECONDS", "5"))
    rounds = int(os.environ.get("ROUNDS", "3"))
    frames = int(seconds * 12.5)

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(  # see bench.py EOS note
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02
    quantize_model(model, mode="w8a8")
    args = model.args

    rng = np.random.RandomState(0)
    prompts = []
    for i in range(n_requests):
        s = 16 + int(rng.randint(0, 16))
        p = np.zeros((s, args.n_audio_codebooks + 1), np.int32)
        p[:, -1] = rng.randint(3, 200, size=s)
        m = np.zeros_like(p)
        m[:, -1] = 1
        prompts.append((p, m))
    audio_sec = n_requests * frames * 0.08

    def build(n_slots, fps, transfer):
        return ContinuousEngine(
            model, n_slots=n_slots, max_frames=frames, max_prompt_bucket=32,
            capacity_slack=max(64, 2 * fps), temperature=0.0, codec=True,
            frames_per_step=fps, transfer=transfer,
            key=jax.random.PRNGKey(1))

    def run(eng):
        t0 = time.perf_counter()
        results = [eng.submit_prompt(p, m, max_frames=frames)
                   for p, m in prompts]
        eng.run_until_idle()
        for r in results:  # consume so queues free
            r.audio()
        return time.perf_counter() - t0

    engines = {"a": build(slots_a, fps_a, transfer_a),
               "b": build(slots_b, fps_b, transfer_b)}
    for eng in engines.values():  # warm: full workload, untimed
        run(eng)

    walls = {"a": [], "b": []}
    for r in range(rounds):
        # Alternate the within-round order (a,b),(b,a),... — monotonic
        # drift inside a round otherwise biases every ratio the same way.
        order = ("a", "b") if r % 2 == 0 else ("b", "a")
        for key in order:
            walls[key].append(run(engines[key]))
    rtf = {k: [audio_sec / w for w in v] for k, v in walls.items()}
    ratios = [b / a for a, b in zip(rtf["a"], rtf["b"])]
    print(json.dumps({
        "metric": "slots_ab_service_rtf",
        "value": round(float(np.median(ratios)), 3),
        "unit": (f"x (slots={slots_b},fps={fps_b} over "
                 f"slots={slots_a},fps={fps_a})"),
        "rtf_a": [round(x, 1) for x in rtf["a"]],
        "rtf_b": [round(x, 1) for x in rtf["b"]],
        "slots_a": slots_a,
        "slots_b": slots_b,
        "fps_a": fps_a,
        "fps_b": fps_b,
        "transfer_a": transfer_a,
        "transfer_b": transfer_b,
        "n_requests": n_requests,
        "seconds_each": seconds,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
