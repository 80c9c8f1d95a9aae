"""Admission -> first-audio-chunk latency of the continuous service UNDER
LOAD (VERDICT r3 item 5).

PERFORMANCE.md's p50-first-chunk (35-60 ms) is the SOLO B=1 stream. The
continuous server admits at block granularity and decodes one block
behind, so a request landing on a 48-busy-slot engine waits for (a) a slot
(queue), (b) the next admit window between step blocks, (c) its prefill,
and (d) the decode-behind block that carries its first frame's audio.
This bench measures that distribution on the REAL engine with the codec
and chunk delivery on (the full service path, production defaults: 48
slots, int16 transfer, frames_per_step=8):

- submit N requests at t=0; every request records submit->first-chunk
  wall latency via the chunk callback;
- the first `SLOTS` requests are admitted into an idle engine at full
  concurrency -> their latency IS admission->first-chunk at load;
- the rest queue for a free slot -> their latency includes queue wait
  (reported separately).

LONG=1 switches to ~`max_prompt_bucket`-token prompts so admission pays a
bucket-512 prefill — the configuration VERDICT r3 flagged as a possible
block-pipeline stall.

Run on TPU: python benchmarks/first_chunk_latency.py
Env: N_REQUESTS=96 SLOTS=48 SECONDS=5.0 LONG=0 ROUNDS=2
"""

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _prompt(args, s, seed):
    rng = np.random.RandomState(seed)
    k = args.n_audio_codebooks + 1
    prompt = np.zeros((s, k), dtype=np.int32)
    prompt[:, -1] = rng.randint(3, 200, size=s)
    mask = np.zeros((s, k), dtype=np.int32)
    mask[:, -1] = 1
    return prompt, mask


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    from csm_mlx_tpu.continuous import ContinuousEngine
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model

    n_requests = int(os.environ.get("N_REQUESTS", "96"))
    n_slots = int(os.environ.get("SLOTS", "48"))
    seconds = float(os.environ.get("SECONDS", "5.0"))
    long_prompts = os.environ.get("LONG", "0") == "1"
    rounds = int(os.environ.get("ROUNDS", "2"))
    frames_per_step = int(os.environ.get("FRAMES_PER_STEP", "8"))

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02
    quantize_model(model, mode="w8a8")
    args = model.args

    frames = int(seconds * 12.5)
    bucket = 512 if long_prompts else 64
    plen = (bucket - 24, bucket - 8) if long_prompts else (16, 48)
    rng = np.random.RandomState(0)
    prompts = [_prompt(args, int(rng.randint(*plen)), 100 + i)
               for i in range(n_requests)]

    eng = ContinuousEngine(
        model, n_slots=n_slots, max_frames=frames,
        max_prompt_bucket=bucket, capacity_slack=64, temperature=0.0,
        codec=True, transfer="int16", frames_per_step=frames_per_step,
        key=jax.random.PRNGKey(1))

    def run(timed):
        t_sub = {}
        t_first = {}

        def make_cb(i):
            def cb(chunk):
                if chunk is not None and i not in t_first:
                    t_first[i] = time.perf_counter()
            return cb

        t0 = time.perf_counter()
        results = []
        for i, (p, m) in enumerate(prompts):
            t_sub[i] = time.perf_counter()
            res = eng.submit_prompt(p, m, max_frames=frames)
            res.set_chunk_callback(make_cb(i))
            results.append(res)
        eng.run_until_idle()
        wall = time.perf_counter() - t0
        for r in results:
            r.wait(0)
        lat = np.array([t_first[i] - t_sub[i] for i in range(n_requests)])
        return lat, wall

    # warmup: full workload once (compiles admit sizes, buckets, shapes)
    run(timed=False)
    eng.stats = type(eng.stats)()

    reports = []
    for r in range(rounds):
        lat, wall = run(timed=True)
        first_wave = lat[:n_slots]     # admitted into the idle engine
        queued = lat[n_slots:]
        audio_sec = n_requests * frames * 0.08
        rep = {
            "metric": "first_chunk_latency_under_load",
            "round": r,
            "prompt_bucket": bucket,
            "frames_per_step": frames_per_step,
            "n_slots": n_slots,
            "n_requests": n_requests,
            "admission_p50_ms": round(float(np.percentile(first_wave, 50))
                                      * 1e3, 1),
            "admission_p99_ms": round(float(np.percentile(first_wave, 99))
                                      * 1e3, 1),
            "admission_max_ms": round(float(first_wave.max()) * 1e3, 1),
            "queued_p50_ms": round(float(np.percentile(queued, 50)) * 1e3, 1)
            if queued.size else None,
            "queued_p99_ms": round(float(np.percentile(queued, 99)) * 1e3, 1)
            if queued.size else None,
            "aggregate_rtf": round(audio_sec / wall, 1),
            # cross-check: the engine's own rolling instrumentation
            # (ContinuousStats.first_chunk_latency_ms, served at /stats)
            "engine_stats": eng.stats.first_chunk_latency_ms(),
        }
        reports.append(rep)
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
