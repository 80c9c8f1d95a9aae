"""Production-capacity serving A/B: KV-bucketed cache vs full buffer.

The serving benchmarks (slots_ab, continuous_decompose) construct engines
sized to their workload (capacity ~288), but the PRODUCTION server
defaults (`csm-tpu serve --continuous`: max_prompt_bucket 512 +
max_frames 1250 + slack 128) allocate a 1890-position cache — and every
step block pays attention reads over the whole static buffer, ~3 GB/step
of dead tail at 48 slots. The KV-bucketed cache (continuous.py: the
buffer grows bucket-by-bucket and eager rebases shrink it back) makes the
production config pay only for its live window.

This bench runs the REAL ContinuousEngine at the production capacity
under a saturated 5 s workload, two arms interleaved A/B/A/B in one
process (shared-chip drift discipline):

  on    KV buckets enabled (default)
  off   CSM_TPU_KV_BUCKETS=0 at construction -> full 1890 buffer

Run on TPU: python benchmarks/prod_capacity_ab.py
Env: SLOTS=48 FRAMES_PER_STEP=8 N_REQ=96 SECONDS=5 ROUNDS=3
"""

import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SLOTS = int(os.environ.get("SLOTS", "48"))
K = int(os.environ.get("FRAMES_PER_STEP", "8"))
N_REQ = int(os.environ.get("N_REQ", "96"))
SECONDS = float(os.environ.get("SECONDS", "5"))
ROUNDS = int(os.environ.get("ROUNDS", "3"))
FRAME_S = 0.08


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from csm_mlx_tpu.continuous import ContinuousEngine
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=model.params["audio_head"].dtype) * 0.02  # EOS never fires
    quantize_model(model, mode="w8a8")
    args = model.args

    frames = int(SECONDS / FRAME_S)
    rng = np.random.RandomState(0)
    prompts = []
    for i in range(N_REQ):
        s = int(rng.randint(8, 28))
        p = np.zeros((s, args.n_audio_codebooks + 1), np.int32)
        p[:, -1] = rng.randint(3, 200, size=s)
        m = np.zeros_like(p)
        m[:, -1] = 1
        prompts.append((p, m))

    def build(buckets_on: bool) -> ContinuousEngine:
        # Production server defaults: max_audio_length_ms=100_000 ->
        # max_frames=1250, max_prompt_bucket=512, slack 128 (cli/serve).
        os.environ["CSM_TPU_KV_BUCKETS"] = "1" if buckets_on else "0"
        return ContinuousEngine(
            model, n_slots=SLOTS, max_frames=1250, max_prompt_bucket=512,
            capacity_slack=128, temperature=0.0, codec=True,
            frames_per_step=K, transfer="int16", key=jax.random.PRNGKey(1))

    def run(eng):
        t0 = time.perf_counter()
        results = [eng.submit_prompt(p, m, max_frames=frames)
                   for p, m in prompts]
        eng.run_until_idle()
        dt = time.perf_counter() - t0
        done = sum(r.done.is_set() for r in results)
        assert done == N_REQ, (done, N_REQ)
        audio_s = sum(len(np.asarray(r.tokens)) for r in results) * FRAME_S
        return dt, audio_s, (eng.stats.rebases, eng.stats.cache_resizes,
                             int(eng._cache.capacity))

    eng_on, eng_off = build(True), build(False)
    assert eng_on.capacity == 1890 and eng_off.capacity == 1890
    assert eng_on._kv_buckets and not eng_off._kv_buckets

    print("# warmup (compiles)...", file=sys.stderr, flush=True)
    run(eng_on), run(eng_off)

    best = {"on": 0.0, "off": 0.0}
    for r in range(ROUNDS):
        for name, eng in (("on", eng_on), ("off", eng_off)):
            dt, audio_s, st = run(eng)
            rtf = audio_s / dt
            best[name] = max(best[name], rtf)
            print(f"# round {r} buckets={name:3s} {dt:6.2f}s "
                  f"{rtf:7.1f}x agg  (rebases={st[0]} resizes={st[1]} "
                  f"dev_cap={st[2]})", file=sys.stderr, flush=True)

    print({"metric": "prod_capacity_serving_rtf", "value": round(best["on"], 1),
           "unit": "aggregate_rtf", "vs_baseline": round(
               best["on"] / max(best["off"], 1e-9), 3),
           "off_rtf": round(best["off"], 1), "on_rtf": round(best["on"], 1),
           "slots": SLOTS, "capacity": 1890, "n_req": N_REQ,
           "seconds": SECONDS})


if __name__ == "__main__":
    main()
