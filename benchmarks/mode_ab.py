"""Interleaved A/B: lockstep (TTSServer) vs continuous (ContinuousTTSServer)
end-to-end service throughput at each one's measured-best defaults.

Same methodology as slots_ab.py: both servers live in ONE process, both
warm on the full burst, then timed bursts alternate A/B/A/B so every pair
shares the chip's current duty cycle (per-process comparisons are drift
noise). The arms never run concurrently, so the shared model is safe.

The reported value is the MEDIAN of per-round ratios: a single round can
still catch a cold program shape or a chip duty-cycle dip (one measured
run: continuous [10.0, 237.0, 246.6] — the 10.0 first round is exactly
that artifact, and the median ignores it).

Run: python benchmarks/mode_ab.py
Env: N_REQUESTS=96 SECONDS=5 ROUNDS=3 MAX_BATCH=48 SLOTS=48
"""

import asyncio
import json
import os
import sys
import time

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
    from csm_mlx_tpu.serve import ContinuousTTSServer, TTSServer

    tok_mod.get_text_tokenizer = lambda path=None: FakeTextTokenizer()

    n_requests = int(os.environ.get("N_REQUESTS", "96"))
    seconds = float(os.environ.get("SECONDS", "5"))
    rounds = int(os.environ.get("ROUNDS", "3"))
    max_batch = int(os.environ.get("MAX_BATCH", "48"))
    n_slots = int(os.environ.get("SLOTS", "48"))

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(  # see bench.py EOS note
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02
    quantize_model(model, mode="w8a8")

    async def run():
        lock = TTSServer(model, max_batch=max_batch, max_wait_ms=40,
                         max_audio_length_ms=seconds * 1000,
                         temperature=0.0, transfer="int16")
        cont = ContinuousTTSServer(model, n_slots=n_slots,
                                   max_audio_length_ms=seconds * 1000,
                                   temperature=0.0)
        servers = {"lockstep": lock, "continuous": cont}

        async def burst(server):
            t0 = time.perf_counter()
            rows = await asyncio.gather(*[
                server.synthesize(f"benchmark request number {i}")
                for i in range(n_requests)])
            wall = time.perf_counter() - t0
            return sum(r.shape[-1] for r in rows) / SAMPLING_RATE, wall

        for s in servers.values():  # warm: full burst shape, untimed
            await burst(s)

        rtf = {k: [] for k in servers}
        for _ in range(rounds):
            for k, s in servers.items():
                audio_sec, wall = await burst(s)
                rtf[k].append(audio_sec / wall)
        for s in servers.values():
            await s.stop()
        return rtf

    rtf = asyncio.run(run())
    ratios = [c / l for l, c in zip(rtf["lockstep"], rtf["continuous"])]
    print(json.dumps({
        "metric": "continuous_over_lockstep_service_rtf",
        "value": round(float(np.median(ratios)), 3),
        "unit": "x (continuous over lockstep)",
        "rtf_lockstep": [round(x, 1) for x in rtf["lockstep"]],
        "rtf_continuous": [round(x, 1) for x in rtf["continuous"]],
        "max_batch": max_batch,
        "n_slots": n_slots,
        "n_requests": n_requests,
        "seconds_each": seconds,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
