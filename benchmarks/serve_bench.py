"""End-to-end TTS *serving* benchmark on the real TPU.

Measures the dynamic-batching server (csm_mlx_tpu/serve.py) as deployed:
N concurrent clients -> asyncio batcher -> batched resident-kernel
generation -> per-caller waveforms. Reports wall-clock aggregate RTF
through the serving layer (coalescing, padding, Mimi decode, per-request
fan-out included), not just the raw compute number bench.py reports.

Offline setup mirrors tests/test_serve.py: full-size CSM-1B with random
weights (RTF is weight-independent), W8A8-quantized, a deterministic fake
text tokenizer (no HF access), random-init Mimi.

Run: python benchmarks/serve_bench.py  [N_REQUESTS=24 SECONDS=5]
"""

import asyncio
import json
import os
import sys
import time

# No egress in the bench environment: fail HF lookups fast (the Mimi
# tokenizer falls back to random init) instead of 5 retries with backoff.
os.environ.setdefault("HF_HUB_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class FakeTextTokenizer:
    bos_token = "<b>"
    eos_token = "<e>"
    bos_token_id = 1
    eos_token_id = 2

    def encode(self, text: str):
        return [1] + [3 + (ord(c) % 50) for c in text[:24]] + [2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    import csm_mlx_tpu.tokenizers as tok_mod
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.segment import SAMPLING_RATE
    from csm_mlx_tpu.serve import TTSServer

    tok_mod.get_text_tokenizer = lambda path=None: FakeTextTokenizer()

    n_requests = int(os.environ.get("N_REQUESTS", "32"))
    seconds = float(os.environ.get("SECONDS", "5"))
    max_batch = int(os.environ.get("MAX_BATCH", "48"))
    transfer = os.environ.get("TRANSFER", "int16")
    continuous = os.environ.get("CONTINUOUS", "0") == "1"
    n_slots = int(os.environ.get("SLOTS", "16"))

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    # Zeroed-init audio_head would make EOS a 1/2051-per-frame coin on c0
    # (see bench.py); random values keep streams running to their caps.
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02
    quantize_model(model, mode="w8a8")

    async def run():
        if continuous:
            from csm_mlx_tpu.serve import ContinuousTTSServer

            server = ContinuousTTSServer(
                model, n_slots=n_slots,
                max_audio_length_ms=seconds * 1000, temperature=0.0)
        else:
            server = TTSServer(model, max_batch=max_batch, max_wait_ms=40,
                               max_audio_length_ms=seconds * 1000,
                               temperature=0.0, transfer=transfer)
        # Warmup: issue the SAME burst shape as the timed run so every
        # (prompt-bucket, batch-bucket) program the run will hit is
        # compiled (a 24-request burst under max_batch=48 buckets to 32 —
        # warming only a 48-batch would leave that compile in the timing;
        # the continuous engine likewise compiles one admit program per
        # padded admit size as slots free up at different rates).
        await asyncio.gather(*[
            server.synthesize(f"warmup {i}") for i in range(n_requests)])
        server.stats.requests = 0
        server.stats.batches = 0
        server.stats.batch_sizes.clear()
        server.stats.generate_seconds = 0.0
        server.stats.audio_seconds = 0.0

        t0 = time.perf_counter()
        rows = await asyncio.gather(*[
            server.synthesize(f"benchmark request number {i}")
            for i in range(n_requests)])
        wall = time.perf_counter() - t0
        await server.stop()
        return server, rows, wall

    server, rows, wall = asyncio.run(run())
    audio_sec = sum(r.shape[-1] for r in rows) / SAMPLING_RATE
    out = {
        "metric": "serve_aggregate_rtf",
        "value": round(audio_sec / wall, 2),
        "unit": "x_realtime",
        "requests": n_requests,
        "wall_sec": round(wall, 2),
        "audio_sec": round(audio_sec, 2),
    }
    if continuous:
        es = server.engine.stats
        out.update({"mode": "continuous", "n_slots": n_slots,
                    "engine_steps": es.steps,
                    "frames_wasted": es.frames_wasted})
    else:
        out.update({"batches": server.stats.batches,
                    "batch_sizes": list(server.stats.batch_sizes),
                    "device_rtf": round(server.stats.aggregate_rtf, 2),
                    "transfer": transfer})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
