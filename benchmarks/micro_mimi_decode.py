"""Where do the 17 ms of batched Mimi block decode go? (serving B=48)

continuous_decompose.py shows the 48-slot engine block pays ~17 ms for
the batched Mimi decode of its 8-frame block — ~20% of the 81 ms block
and the largest term after generation itself. The FLOP floor of SEANet
decode is ~50x lower, so the cost must be layout/fusion, not math. This
micro times the four stages of `mimi_decode_step_fn` separately, each
chained REPS times inside ONE jit (long-program methodology; carried
states stop hoisting):

  rvq        split RVQ dequant: (B, 32, F) codes -> (B, 512, F) latent
  upsample   grouped stride-2 conv-transpose (B, 512, F) -> (B, 512, 2F)
  transformer 8-layer d=512 codec transformer over 2F tokens w/ ring KV
  seanet     the SEANet decoder: 4 conv-transpose upsample stages
             (ratios 8,6,5,4) + residual convs -> (B, 1, F*1920)
  full       the whole mimi_decode_step_fn

Run on TPU: python benchmarks/micro_mimi_decode.py [arm ...]
Env: MIMI_B=48 MIMI_F=8 MIMI_REPS=32
     MIMI_QUANT=seanet,transformer  quantize the decode path (W8A8, see
     models/mimi/quant.py) before timing
     MIMI_QUANT_AB=1  build f32 AND quantized param trees, time the arms
     interleaved A/B in one process (the only drift-safe comparison)
"""

import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("MIMI_B", "48"))
F = int(os.environ.get("MIMI_F", "8"))
REPS = int(os.environ.get("MIMI_REPS", "32"))


def _time(jfn, *args):
    import jax

    t0 = time.perf_counter()
    jax.device_get(jfn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best


def quant_ab(jax, jnp, mimi):
    """Interleaved A/B of the full block decode: f32 vs W8A8-quantized
    param trees (same decode-state dtype, same codes), REPS blocks chained
    per program. Reports ms/block per arm + the parity of the two decodes
    on one un-chained block (rel RMSE)."""
    import copy

    from csm_mlx_tpu.models.mimi.mimi import mimi_decode_step_fn
    from csm_mlx_tpu.models.mimi.quant import quantize_mimi_decoder

    cfg = mimi.cfg
    p_f32 = mimi.params
    arms = {"f32": p_f32}
    for tgt in ("seanet", "transformer", "seanet,transformer"):
        m2 = copy.copy(mimi)
        # tree_map rebuilds every container (same array leaves), so
        # quantization's in-place container edits can't alias the f32 tree
        m2.params = jax.tree_util.tree_map(lambda a: a, p_f32)
        quantize_mimi_decoder(m2, targets=tuple(tgt.split(",")))
        arms[f"w8a8:{tgt}"] = m2.params

    codes = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.codebook_size, (B, 32, F)),
        jnp.int32)
    dec0 = mimi.init_decode_state(B, chunk_frames=F)

    def make(params):
        @jax.jit
        def run(p, c, st0):
            def body(carry, _):
                x, st = carry
                y, st = mimi_decode_step_fn(p, cfg, x, st)
                bump = (jnp.mean(y.astype(jnp.float32)) > 1e30).astype(
                    x.dtype)
                return ((x + 1 + bump) % cfg.codebook_size, st), jnp.mean(y)

            (_, _), ys = jax.lax.scan(body, (c, st0), None, length=REPS)
            return jnp.sum(ys)

        jax.device_get(run(params, codes, dec0))  # compile + warm
        return lambda: jax.device_get(run(params, codes, dec0))

    fns = {}
    for name, p in arms.items():
        t0 = time.perf_counter()
        fns[name] = make(p)
        print(f"built {name!r} in {time.perf_counter() - t0:.0f}s",
              flush=True)

    results = {k: [] for k in fns}
    for r in range(int(os.environ.get("ROUNDS", "4"))):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            fn()
            results[name].append((time.perf_counter() - t0) / REPS * 1e3)
        print(f"round {r}: " + "  ".join(
            f"{k}={results[k][-1]:.2f}" for k in fns), flush=True)
    print(f"\nB={B} F={F}, ms/block (best | median):")
    for name, vals in results.items():
        v = sorted(vals)
        print(f"  {name:24s} {v[0]:6.2f} | {v[len(v) // 2]:6.2f}")

    # parity: one block, same state, f32 vs full quant
    one = jax.jit(lambda p, c, st: mimi_decode_step_fn(p, cfg, c, st)[0])
    a = np.asarray(jax.device_get(one(arms["f32"], codes, dec0)),
                   np.float32)
    b = np.asarray(jax.device_get(
        one(arms["w8a8:seanet,transformer"], codes, dec0)), np.float32)
    rel = float(np.sqrt(np.mean((a - b) ** 2)) /
                (np.sqrt(np.mean(a ** 2)) + 1e-12))
    print(f"one-block decode rel RMSE quant-vs-f32: {rel:.4f} "
          f"(random weights)")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from csm_mlx_tpu.models.mimi.conv import (
        causal_conv_transpose1d_streaming, make_convtr_state)
    from csm_mlx_tpu.models.mimi.mimi import mimi_decode_step_fn
    from csm_mlx_tpu.models.mimi.rvq import split_rvq_decode
    from csm_mlx_tpu.models.mimi.seanet import (seanet_decode_streaming,
                                                seanet_decoder_init_state)
    from csm_mlx_tpu.models.mimi.transformer import transformer_forward
    from csm_mlx_tpu.tokenizers import get_audio_tokenizer

    mimi = get_audio_tokenizer(32)
    cfg = mimi.cfg
    params = mimi.params
    # MIMI_DTYPE=bfloat16: cast params (conv kernels follow the activation
    # dtype anyway) + latents to probe the bf16-decode speedup. The
    # reference deployment is itself bf16 (kyutai/moshiko-pytorch-bf16).
    dt = jnp.dtype(os.environ.get("MIMI_DTYPE", "float32"))
    if dt != jnp.float32:
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
        mimi.params = params
        mimi.dtype = dt
    if os.environ.get("MIMI_QUANT"):
        from csm_mlx_tpu.models.mimi.quant import quantize_mimi_decoder

        quantize_mimi_decoder(
            mimi, targets=tuple(os.environ["MIMI_QUANT"].split(",")))
        params = mimi.params
    if os.environ.get("MIMI_QUANT_AB", "0") == "1":
        quant_ab(jax, jnp, mimi)
        return
    want = sys.argv[1:] or ["rvq", "upsample", "transformer", "seanet",
                            "full"]

    codes = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.codebook_size, (B, 32, F)),
        jnp.int32)
    d = cfg.hidden_size
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, d, F), jnp.float32
                            ).astype(dt)
    lat2 = jax.random.normal(jax.random.PRNGKey(2),
                             (B, d, 2 * F), jnp.float32).astype(dt)

    def chain(fn, x0, state0=None):
        """REPS data-dependent iterations; returns a tiny reduction."""
        def body(carry, _):
            x, st = carry
            y, st = fn(x, st)
            # data-dependent, dtype-safe perturbation (+1 for ints, tiny for
            # floats) so XLA can't hoist the body or precompute the inputs
            bump = (jnp.mean(y.astype(jnp.float32)) > 1e30).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x + 1 + bump
            else:
                x = x + 1e-6 * (1.0 + bump)
            return (x, st), jnp.mean(y.astype(jnp.float32))

        (x, _), ys = jax.lax.scan(body, (x0, state0), None, length=REPS)
        return jnp.sum(ys)

    arms = {}
    if "rvq" in want:
        arms["rvq"] = (jax.jit(lambda c: chain(
            lambda x, st: (split_rvq_decode(params["quantizer"],
                                            (x + c) % cfg.codebook_size),
                           st),
            jnp.zeros_like(c))), (codes,))
    if "upsample" in want:
        st0 = make_convtr_state(d, 2 * cfg.downsample_stride,
                                cfg.downsample_stride, B, dt)
        arms["upsample"] = (jax.jit(lambda x: chain(
            lambda y, st: causal_conv_transpose1d_streaming(
                params["upsample"], y, st, stride=cfg.downsample_stride,
                groups=cfg.upsample_groups),
            x, st0)), (lat,))
    if "transformer" in want:
        from csm_mlx_tpu.models.mimi.transformer import RingKVCache

        kv0 = RingKVCache.init(cfg, B, dtype=mimi.dtype,
                               slack=max(8, 2 * F))

        def tf(x, st):
            h, st = transformer_forward(params["decoder_transformer"], cfg,
                                        x.transpose(0, 2, 1), cache=st)
            return h.transpose(0, 2, 1), st

        arms["transformer"] = (jax.jit(lambda x: chain(tf, x, kv0)),
                               (lat2,))
    if "seanet" in want:
        sn0 = seanet_decoder_init_state(params["decoder"], cfg, B,
                                        mimi.dtype)
        arms["seanet"] = (jax.jit(lambda x: chain(
            lambda y, st: seanet_decode_streaming(
                params["decoder"], cfg, y, st),
            x, sn0)), (lat2,))
    if "full" in want:
        dec0 = mimi.init_decode_state(B, chunk_frames=F)
        arms["full"] = (jax.jit(lambda c: chain(
            lambda x, st: mimi_decode_step_fn(
                params, cfg, (x + c) % cfg.codebook_size, st),
            jnp.zeros_like(c), dec0)), (codes,))

    for name, (jfn, args) in arms.items():
        c, r = _time(jfn, *args)
        print(f"{name:12s} compile {c:6.1f}s  run {r*1e3:8.1f} ms  "
              f"{r / REPS * 1e3:7.2f} ms/block", flush=True)


if __name__ == "__main__":
    main()
