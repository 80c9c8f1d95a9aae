"""Why is the backbone decode step 3.2 ms when weights stream at 640 GB/s?

micro_hbm_roofline.py (long-program regime, REPS=256) shows this chip
streams int8 at ~640 GB/s through BOTH XLA dots and the W8A8 Pallas kernel
on big (8192, 8192) weights. The backbone step reads 0.97 GB of int8 per
frame -> ideal ~1.5 ms, measured ~3.2 ms. This probe isolates where the
other ~1.7 ms goes, every arm chained inside ONE long jit program:

  shapes   the W8A8 kernel over the REAL 64 per-layer matvecs
           (16 x [qkv (3072,2048), o (2048,2048), gateup (16384,2048),
           down (2048,8192)]) — same bytes as the backbone, real call sizes
  fused    same total bytes in 16 calls of (7424, 8192) — one call per
           layer's bytes: what fewer/larger kernel calls would buy
  step     the real generation._backbone_step chained REPS times with a
           loop-carried KV cache — the production step incl. attention,
           norms, embeds, rope
  frame    step + the real _decode_frame (resident decoder kernel +
           sampling) in a lax.scan — the full per-frame compute
  loop     the actual production _build_generate_tokens program (prefill +
           lax.while_loop with per-row EOS cond + frames DUS) — what
           bench.py times; loop - frame = while/cond/DUS overhead

Run on TPU: python benchmarks/micro_backbone_gap.py [arm ...]
Env: GAP_REPS=64 (shapes/fused), GAP_STEP_REPS=256 (step/frame/loop),
GAP_B=1 (batch rows for step/frame/dec — GAP_B=48 splits the continuous
engine's gen phase into its backbone and resident-decoder terms)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("GAP_REPS", "64"))
STEP_REPS = int(os.environ.get("GAP_STEP_REPS", "256"))
GAP_B = int(os.environ.get("GAP_B", "1"))

LAYER_SHAPES = [(3072, 2048), (2048, 2048), (16384, 2048), (2048, 8192)]
N_LAYERS = 16
LAYER_BYTES = sum(n * k for n, k in LAYER_SHAPES)  # 60.8 MB int8


def _time(fn, *args, prejitted=False):
    jfn = fn if prejitted else jax.jit(fn)
    t0 = time.perf_counter()
    jax.device_get(jfn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def report(name, compile_s, run_s, total_bytes, per_what):
    per = run_s / per_what[1] * 1e3
    print(f"{name:8s} compile {compile_s:6.1f}s  run {run_s*1e3:8.1f} ms  "
          f"{total_bytes / run_s / 1e9:7.1f} GB/s  "
          f"{per:6.3f} ms/{per_what[0]}", flush=True)


def _w8a8_chain(shapes_calls):
    """Weights for `shapes_calls` [(n, k), ...] repeated per rep; returns
    (f, args, bytes_per_rep)."""
    from csm_mlx_tpu.ops import quant as q

    ws, ss, zs = [], [], []
    for i, (n, k) in enumerate(shapes_calls):
        ws.append(jnp.asarray(
            np.random.RandomState(i).randint(-127, 127, (n, k)), jnp.int8))
        ss.append(jnp.ones((n, 1), jnp.float32))
        zs.append(jnp.zeros((n, 1), jnp.float32))
    xs_pool = {k: jax.random.normal(jax.random.PRNGKey(k), (16, GAP_B, k),
                                    jnp.float32).astype(jnp.bfloat16)
               for k in {k for _n, k in shapes_calls}}

    def f(ws, ss, zs, xs_pool):
        def body(r, acc):
            for w, s, z in zip(ws, ss, zs):
                x = jax.lax.dynamic_index_in_dim(
                    xs_pool[w.shape[1]], r % 16, keepdims=False)
                y = q._pallas_quant_matvec_w8a8(
                    x, w, s, z, bits=8, group_size=w.shape[1])
                acc += jnp.sum(y.astype(jnp.float32))
            return acc
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    bytes_per_rep = sum(n * k for n, k in shapes_calls)
    return f, (ws, ss, zs, xs_pool), bytes_per_rep


def main():
    want = sys.argv[1:] or ["shapes", "fused", "step"]
    if "shapes" in want:
        calls = [s for _ in range(N_LAYERS) for s in LAYER_SHAPES]
        f, args, bpr = _w8a8_chain(calls)
        c, r = _time(f, *args)
        report("shapes", c, r, bpr * REPS, ("step", REPS))

    if "fused" in want:
        # one call per layer's bytes: (7424, 8192) int8 = 60.8 MB
        f, args, bpr = _w8a8_chain([(7424, 8192)] * N_LAYERS)
        c, r = _time(f, *args)
        report("fused", c, r, bpr * REPS, ("step", REPS))

    if not ({"step", "frame", "dec", "loop", "embeds", "attn"} & set(want)):
        return

    import dataclasses

    from csm_mlx_tpu.generation import (_backbone_step, _decode_frame,
                                        _frame_to_next_input)
    from csm_mlx_tpu.models.csm import CSM, csm_1b
    from csm_mlx_tpu.ops.kv_cache import KVCache
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.ops.rope import rope_cache_for
    from csm_mlx_tpu.ops.sampling import HISTORY_SIZE, SamplerConfig

    model = CSM(csm_1b(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        dtype=jnp.bfloat16) * 0.02  # EOS never fires (bench.py)
    quantize_model(model, mode="w8a8")
    args_m = model.args
    bcfg = args_m.backbone_config
    dcfg = args_m.decoder_config
    capacity = int(os.environ.get("GAP_CAP", "640"))
    cos_b, sin_b = rope_cache_for(bcfg, max(
        capacity, bcfg.max_position_embeddings))
    cos_d, sin_d = rope_cache_for(dcfg, args_m.n_audio_codebooks + 1)
    smp = SamplerConfig(temperature=0.0)
    cache = KVCache.init(bcfg, GAP_B, capacity, dtype=jnp.bfloat16)
    cache = dataclasses.replace(cache, index=jnp.asarray(64, jnp.int32))
    pad = jnp.zeros((GAP_B,), jnp.int32)
    bytes_per_step = LAYER_BYTES * N_LAYERS  # whole backbone per step

    if "embeds" in want:
        from csm_mlx_tpu.models.csm import masked_input_embeds

        def f(params):
            frame0 = jnp.ones((GAP_B, 1, args_m.n_audio_codebooks + 1),
                              jnp.int32)
            mask0 = jnp.ones_like(frame0)

            def body(carry, _):
                toks = carry
                h = masked_input_embeds(params, args_m, toks, mask0)
                toks = (toks + h[:, :, :33].astype(jnp.int32) % 3) % 2051
                return toks, h[0, 0, 0]

            _t, hs = jax.lax.scan(f=body, init=frame0, xs=None,
                                  length=STEP_REPS)
            return jnp.sum(hs)

        c, r = _time(f, model.params)
        report("embeds", c, r, GAP_B * 33 * 2048 * 2 * STEP_REPS,
               ("step", STEP_REPS))

    if "attn" in want:
        # 16 layers of (KV DUS append + masked-einsum sdpa over capacity),
        # chained — the attention machinery alone, no projections/MLP.
        from csm_mlx_tpu.ops.attention import key_validity_bias, sdpa

        nh, nkv, hd = (bcfg.num_attention_heads, bcfg.num_key_value_heads,
                       bcfg.head_dim)

        def f(cache):
            q0 = jax.random.normal(jax.random.PRNGKey(2),
                                   (GAP_B, nh, 1, hd), jnp.bfloat16)
            k_idx = jnp.arange(capacity, dtype=jnp.int32)

            def body(carry, _):
                q, cache = carry
                key_valid = (k_idx[None] >= pad[:, None]) & (
                    k_idx[None] <= cache.index)
                bias = key_validity_bias(key_valid)[:, None]
                outs = q
                for li in range(N_LAYERS):
                    kn = outs[:, :nkv] * 0.1
                    vn = outs[:, :nkv] * 0.2
                    cache2, kk, vv = cache.update_layer(li, kn, vn)
                    cache = cache2
                    outs = sdpa(q, kk, vv, scale=hd ** -0.5, mask_bias=bias)
                cache = cache.advance(1)
                q = q + 1e-6 * outs
                return (q, cache), outs[0, 0, 0, 0]

            (_q, cache), hs = jax.lax.scan(
                body, (q0, cache), None, length=STEP_REPS)
            return jnp.sum(hs)

        kv_bytes = N_LAYERS * 2 * GAP_B * capacity * \
            (bcfg.num_key_value_heads * bcfg.head_dim) * 2
        c, r = _time(f, cache)
        report("attn", c, r, kv_bytes * STEP_REPS, ("step", STEP_REPS))

    if "step" in want:

        def f(params, cache):
            frame0 = jnp.ones((GAP_B, args_m.n_audio_codebooks), jnp.int32)

            def body(carry, _):
                frame, cache = carry
                tokens, mask = _frame_to_next_input(frame)
                hidden, cache = _backbone_step(
                    params, args_m, tokens, mask, pad, cache, cos_b, sin_b)
                # cheap data-dependent next frame so nothing hoists; the
                # decoder phase is deliberately absent (measured separately)
                frame = (frame + hidden[:, :32].astype(jnp.int32) % 3) % 2051
                return (frame, cache), hidden[0, 0]

            (_f, cache), hs = jax.lax.scan(
                body, (frame0, cache), None, length=STEP_REPS)
            return jnp.sum(hs)

        c, r = _time(f, model.params, cache)
        report("step", c, r, bytes_per_step * STEP_REPS, ("step", STEP_REPS))

    if "frame" in want:

        def f(params, cache, key):
            frame0 = jnp.ones((GAP_B, args_m.n_audio_codebooks), jnp.int32)
            hist0 = jnp.full((GAP_B, HISTORY_SIZE), -1, jnp.int32)

            def body(carry, _):
                frame, cache, key, history = carry
                tokens, mask = _frame_to_next_input(frame)
                hidden, cache = _backbone_step(
                    params, args_m, tokens, mask, pad, cache, cos_b, sin_b)
                frame, key, history = _decode_frame(
                    params, args_m, hidden, key, history, smp, (),
                    cos_d, sin_d)
                return (frame, cache, key, history), frame[0, 0]

            (_f, cache, _k, _h), f0 = jax.lax.scan(
                body, (frame0, cache, key, hist0), None, length=STEP_REPS)
            return jnp.sum(f0)

        c, r = _time(f, model.params, cache, jax.random.PRNGKey(1))
        report("frame", c, r, bytes_per_step * STEP_REPS, ("step", STEP_REPS))

    if "dec" in want:

        def f(params, key):
            frame0 = jnp.ones((GAP_B, args_m.n_audio_codebooks), jnp.int32)
            hist0 = jnp.full((GAP_B, HISTORY_SIZE), -1, jnp.int32)
            hidden0 = jax.random.normal(jax.random.PRNGKey(9),
                                        (GAP_B, bcfg.hidden_size),
                                        jnp.bfloat16)

            def body(carry, _):
                frame, key, history = carry
                # loop-variant hidden (depends on the previous frame) so
                # nothing hoists; the backbone phase is deliberately absent
                hidden = hidden0 * (1.0 + 1e-6 * frame[0, 0].astype(
                    jnp.bfloat16))
                frame, key, history = _decode_frame(
                    params, args_m, hidden, key, history, smp, (),
                    cos_d, sin_d)
                return (frame, key, history), frame[0, 0]

            (_f, _k, _h), f0 = jax.lax.scan(
                body, (frame0, jax.random.PRNGKey(1), hist0), None,
                length=STEP_REPS)
            return jnp.sum(f0)

        c, r = _time(f, model.params, jax.random.PRNGKey(1))
        report("dec", c, r, 106 * 2**20 * STEP_REPS, ("step", STEP_REPS))

    if "loop" in want:
        from csm_mlx_tpu.generation import _build_generate_tokens

        bucket = 32
        gen_fn = _build_generate_tokens(args_m, smp, (), bucket, STEP_REPS,
                                        "bfloat16")
        rng = np.random.RandomState(0)
        toks = np.zeros((1, bucket, 33), np.int32)
        toks[0, :, -1] = rng.randint(3, 200, size=bucket)
        msk = np.zeros((1, bucket, 33), np.int32)
        msk[0, :, -1] = 1

        def f(params, t, m, p, key):
            return gen_fn(params, t, m, p, key)[1]

        c, r = _time(f, model.params, jnp.asarray(toks), jnp.asarray(msk),
                     jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(1),
                     prejitted=True)
        report("loop", c, r, bytes_per_step * STEP_REPS, ("step", STEP_REPS))


if __name__ == "__main__":
    main()
