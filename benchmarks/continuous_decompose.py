"""Decompose the continuous engine's steady-state block cost (VERDICT r2 #6).

The gap between raw compute aggregate (~500x at B=48 lockstep) and the
continuous engine's steady state has never been broken down. This bench
times four arms, interleaved A/B/A/B inside ONE process (the shared chip
drifts too much for back-to-back runs — CLAUDE.md), all at the serving
configuration (48 slots, frames_per_step=8, W8A8 + resident kernel):

  gen        step block WITHOUT codec (pure generation compute)
  gen+mimi   step block with the fused Mimi decode (codec cost = this - gen)
  mimi-only  JUST the step's Mimi tail (transpose + K-frame block decode +
             int16), its own jitted program dispatched per block — isolates
             whether the in-step codec cost is co-residence with the
             generation program or the block decode's own price
  +fetch     gen+mimi + per-block device_get of (frames, chunks, eos) through
             the tunnel at pipeline depth 2 (transfer cost = this - gen+mimi)
  engine     the real ContinuousEngine driven saturated (host scheduling
             cost = this - +fetch)

Prints one JSON line with per-arm ms/block, the per-phase breakdown, and
the implied steady-state aggregate RTF of each arm.

Run: python benchmarks/continuous_decompose.py
Env: SLOTS=48 FRAMES_PER_STEP=8 BLOCKS=24 ROUNDS=3 TRANSFER=int16
"""

import dataclasses
import json
import os
import sys
import time
from collections import deque

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SLOTS = int(os.environ.get("SLOTS", "48"))
K = int(os.environ.get("FRAMES_PER_STEP", "8"))
BLOCKS = int(os.environ.get("BLOCKS", "24"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))
TRANSFER = os.environ.get("TRANSFER", "int16")
CAPACITY = 640


def _fresh_carry(args, jnp, jax, KVCache, dtype, bootstrap=512):
    cache = KVCache.init(args.backbone_config, SLOTS, CAPACITY, dtype=dtype)
    cache = dataclasses.replace(
        cache, index=jnp.asarray(bootstrap, jnp.int32))
    pad = jnp.full((SLOTS,), bootstrap - 1, jnp.int32)
    frame = jnp.ones((SLOTS, args.n_audio_codebooks), jnp.int32)
    from csm_mlx_tpu.generation import HISTORY_SIZE

    history = jnp.full((SLOTS, HISTORY_SIZE), -1, jnp.int32)
    key = jax.random.PRNGKey(0)
    return frame, pad, cache, key, history


def main():
    import jax

    if os.environ.get("DECOMP_TINY"):  # smoke runs off-chip
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    from csm_mlx_tpu.continuous import (ContinuousEngine,
                                        _build_continuous_fns, _dtype_name)
    from csm_mlx_tpu.generation import _resolve_sampler
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.kv_cache import KVCache
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.tokenizers import get_audio_tokenizer

    if os.environ.get("DECOMP_TINY"):  # CPU smoke: wiring only, no numbers
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from conftest import tiny_args

        model = CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
                    rng=jax.random.PRNGKey(0))
    else:
        model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    # Random audio_head so frames never argmax to the all-zero EOS (bench.py)
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=model.params["audio_head"].dtype) * 0.02
    if not os.environ.get("DECOMP_TINY"):
        quantize_model(model, mode="w8a8")
    args = model.args
    dtype_name = _dtype_name(model.dtype)
    smp = _resolve_sampler(0.0, None)
    mimi = get_audio_tokenizer(args.n_audio_codebooks)

    step_nomimi = _build_continuous_fns(
        args, smp, (), dtype_name, CAPACITY, None, K)[0]
    step_mimi = _build_continuous_fns(
        args, smp, (), dtype_name, CAPACITY, mimi.cfg, K, TRANSFER)[0]

    # --- arm drivers (each returns seconds for BLOCKS blocks) -----------
    def run_gen():
        carry = _fresh_carry(args, jnp, jax, KVCache, jnp.dtype(dtype_name))
        frame, pad, cache, key, history = carry
        dec = None
        t0 = time.perf_counter()
        out = None
        for _ in range(BLOCKS):
            (frame, cache, key, history, dec,
             _f, _c, eos) = step_nomimi(
                model.params, frame, pad, cache, key, history, None, dec)
            out = eos
        jax.device_get(out)  # fence: device queue is serialized
        return time.perf_counter() - t0

    def run_mimi(fetch: bool):
        carry = _fresh_carry(args, jnp, jax, KVCache, jnp.dtype(dtype_name))
        frame, pad, cache, key, history = carry
        dec = mimi.init_decode_state(SLOTS, chunk_frames=K)
        inflight = deque()
        t0 = time.perf_counter()
        out = None
        for _ in range(BLOCKS):
            (frame, cache, key, history, dec,
             fr, ch, eos) = step_mimi(
                model.params, frame, pad, cache, key, history,
                mimi.params, dec)
            if fetch:
                inflight.append((fr, ch, eos))
                while len(inflight) > 2:  # engine pipeline_depth=2
                    jax.device_get(inflight.popleft())
            out = eos
        if fetch:
            while inflight:
                jax.device_get(inflight.popleft())
        else:
            jax.device_get(out)
        return time.perf_counter() - t0

    import functools

    from csm_mlx_tpu.models.mimi.mimi import mimi_decode_step_fn

    @functools.partial(jax.jit, donate_argnums=(2,))
    def mimi_tail(mimi_params, owed, dec):
        # exactly the step()'s codec tail: (K, B, n_cb) frames -> int16 chunks
        codes = owed.transpose(1, 2, 0).astype(jnp.int32)
        audio, dec = mimi_decode_step_fn(mimi_params, mimi.cfg, codes, dec)
        fs = audio.shape[-1] // K
        chunks = audio.reshape(-1, K, fs).transpose(1, 0, 2)
        if TRANSFER == "int16":
            chunks = (jnp.clip(chunks, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return chunks, dec

    def run_mimi_only():
        rngl = np.random.RandomState(7)
        owed = [jnp.asarray(rngl.randint(
            0, 2048, (K, SLOTS, args.n_audio_codebooks)), jnp.int32)
            for _ in range(BLOCKS)]
        dec = mimi.init_decode_state(SLOTS, chunk_frames=K)
        t0 = time.perf_counter()
        out = None
        for b in range(BLOCKS):
            out, dec = mimi_tail(mimi.params, owed[b], dec)
        jax.device_get(out)
        return time.perf_counter() - t0

    def run_engine(eng, prompts):
        # Saturate all slots with equal-length requests; the admission burst
        # happens once, then pure stepping. Timed region covers everything
        # (the engine IS the product), frames counted from stats.
        eng.stats = type(eng.stats)()
        t0 = time.perf_counter()
        res = [eng.submit_prompt(p, m, max_frames=BLOCKS * K - 1)
               for p, m in prompts]
        eng.run_until_idle()
        dt = time.perf_counter() - t0
        for r in res:
            r.wait(0)
        return dt, eng.stats

    rng = np.random.RandomState(0)
    width = args.n_audio_codebooks + 1
    prompt = np.zeros((32, width), np.int32)
    prompt[:, -1] = rng.randint(3, 200, size=32)
    pm = np.zeros((32, width), np.int32)
    pm[:, -1] = 1
    prompts = [(prompt, pm)] * SLOTS

    eng = ContinuousEngine(
        model, n_slots=SLOTS, max_frames=BLOCKS * K, max_prompt_bucket=32,
        capacity_slack=64, temperature=0.0, codec=True,
        frames_per_step=K, transfer=TRANSFER, key=jax.random.PRNGKey(1))

    # --- warmup every arm (compiles; also the one-time first-exec cost) --
    print("# warmup...", file=sys.stderr, flush=True)
    run_gen(); run_mimi(False); run_mimi_only(); run_mimi(True)
    run_engine(eng, prompts)

    arms = {"gen": lambda: run_gen(),
            "gen+mimi": lambda: run_mimi(False),
            "mimi-only": run_mimi_only,
            "+fetch": lambda: run_mimi(True)}
    best = {name: float("inf") for name in arms}
    best["engine"] = float("inf")
    eng_frames = 0
    for r in range(ROUNDS):
        for name, fn in arms.items():
            dt = fn()
            best[name] = min(best[name], dt)
            print(f"# round {r} {name:9s} {dt / BLOCKS * 1e3:7.2f} ms/block",
                  file=sys.stderr, flush=True)
        dt, stats = run_engine(eng, prompts)
        blocks = max(stats.steps, 1)
        eng_frames = stats.frames_emitted
        best["engine"] = min(best["engine"], dt / blocks * BLOCKS)
        print(f"# round {r} engine    {dt / blocks * 1e3:7.2f} ms/block "
              f"({stats.steps} steps, {stats.frames_emitted} frames, "
              f"{stats.admissions} admits)", file=sys.stderr, flush=True)

    ms = {name: best[name] / BLOCKS * 1e3 for name in best}
    audio_per_block = K * SLOTS * 0.08  # row-frames * 80 ms
    rtf = {name: audio_per_block / (ms[name] / 1e3) for name in ms}
    print(json.dumps({
        "metric": "continuous_step_breakdown",
        "value": round(ms["engine"], 2),
        "unit": "ms_per_block",
        "vs_baseline": round(rtf["engine"], 1),
        "ms_per_block": {k: round(v, 2) for k, v in ms.items()},
        "aggregate_rtf": {k: round(v, 1) for k, v in rtf.items()},
        "phase_ms": {
            "generation": round(ms["gen"], 2),
            "mimi_decode": round(ms["gen+mimi"] - ms["gen"], 2),
            "mimi_standalone": round(ms["mimi-only"], 2),
            "transfer": round(ms["+fetch"] - ms["gen+mimi"], 2),
            "host_sched": round(ms["engine"] - ms["+fetch"], 2),
        },
        "slots": SLOTS, "frames_per_step": K, "blocks": BLOCKS,
        "transfer": TRANSFER, "engine_frames": eng_frames,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
