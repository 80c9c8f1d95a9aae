"""Go/no-go micro for the one named Mimi-decode lever (VERDICT r4 #5).

`gen_roofline.py`'s accounting shows the 15 ms Mimi block decode is NOT
envelope-bound: its four stages do ~0.5 GB + ~11 GF of work (~1.4 ms at
the session envelope) yet cost ~15 ms. The layout hypothesis: SEANet's
(B, C, T) convs put T in the MXU lane dimension, and the early decoder
stages run at T = 16-768 — mostly-padding tiles (T=16 fills 12.5% of the
128 lanes). The candidate lever: an im2col/matmul layout that flattens
(B*T) into the matmul M dimension (768+ rows at B=48) with C_in*K as the
contraction — proper MXU shapes at every stage.

Decision harness: the WHOLE decoder chain in both layouts, chained REPS
blocks inside one jit with only the (B, 512, 2F) latent carried (carrying
activations would add a ~100 MB copy per rep and drown the comparison —
the first version of this micro made exactly that mistake). Numerical
parity asserted against the production batch decode first. GO if the
matmul chain is >=2x; in between: partial-adoption judgement call; the
decision lands in PERFORMANCE.md.

Implementations:
  conv (k, dil, stride=1):  causal left-pad, taps stacked tap-major ->
                            (B*T, C_in*K) @ (C_in*K, C_out)
  convtr (k=2s, stride s):  (B*T, C_in) @ (C_in, C_out*K) -> overlap-add
                            of the two s-wide halves (k=2s => exactly two
                            taps overlap per output sample), causal trim

Run on TPU: python benchmarks/micro_mimi_layout.py
Env: ML_B=48 ML_F=8 ML_REPS=24
"""

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("ML_B", "48"))
F = int(os.environ.get("ML_F", "8"))
REPS = int(os.environ.get("ML_REPS", "24"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from csm_mlx_tpu.models.mimi.seanet import (seanet_decode,
                                                seanet_decode_streaming,
                                                seanet_decoder_init_state)
    from csm_mlx_tpu.tokenizers import get_audio_tokenizer

    mimi = get_audio_tokenizer(32)
    cfg = mimi.cfg
    dec = mimi.params["decoder"]
    elu = jax.nn.elu

    # ---- matmul-layout building blocks ---------------------------------
    def conv_mm(p, x, dil=1):
        w = p["weight"]
        c_out, c_in, k = w.shape
        x = jnp.pad(x, ((0, 0), (0, 0), ((k - 1) * dil, 0)))  # causal
        t_out = x.shape[-1] - (k - 1) * dil
        cols = jnp.concatenate(
            [x[:, :, i * dil:i * dil + t_out] for i in range(k)], axis=1)
        m = cols.transpose(0, 2, 1).reshape(-1, c_in * k)
        w2 = w.transpose(2, 1, 0).reshape(k * c_in, c_out)
        y = m @ w2.astype(m.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y.reshape(x.shape[0], t_out, c_out).transpose(0, 2, 1)

    def convtr_mm(p, x, stride):
        w = p["weight"]
        c_in, c_out, k = w.shape
        assert k == 2 * stride, (k, stride)
        bsz, _, t_in = x.shape
        m = x.transpose(0, 2, 1).reshape(-1, c_in)
        w2 = w.reshape(c_in, c_out * k)
        y = (m @ w2.astype(m.dtype)).reshape(bsz, t_in, c_out, k)
        first = y[..., :stride]
        second = jnp.pad(y[..., stride:],
                         ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :t_in]
        out = (first + second).transpose(0, 2, 1, 3).reshape(
            bsz, c_out, t_in * stride)
        if "bias" in p:
            out = out + p["bias"].astype(out.dtype)[None, :, None]
        return out

    def seanet_decode_mm(params, cfg, x):
        g = cfg.dilation_growth_rate
        h = conv_mm(params["init"], x)
        for stage, ratio in zip(params["stages"], cfg.upsampling_ratios):
            h = convtr_mm(stage["up"], elu(h), ratio)
            for j, block in enumerate(stage["residual"]):
                r = conv_mm(block["conv1"], elu(h), dil=g ** j)
                r = conv_mm(block["conv2"], elu(r))
                h = h + r
        return conv_mm(params["final"], elu(h))

    # ---- parity vs the production batch decode -------------------------
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.hidden_size, 2 * F), jnp.float32)
    ref = np.asarray(jax.jit(
        lambda x: seanet_decode(dec, cfg, x))(lat), np.float64)
    got = np.asarray(jax.jit(
        lambda x: seanet_decode_mm(dec, cfg, x))(lat), np.float64)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-3, err
    print(f"# parity (mm vs production batch decode): rel {err:.2e}",
          flush=True)

    # ---- timing: whole chains, tiny carry, interleaved -----------------
    st0 = seanet_decoder_init_state(dec, cfg, B, jnp.float32)

    def make_arm(fn, with_state):
        def f(x, st):
            def body(carry, _):
                x, st = carry
                if with_state:
                    y, st = fn(x, st)
                else:
                    y = fn(x)
                x = x * (1.0 + 1e-6 * jnp.mean(y))
                return (x, st), jnp.mean(y)

            (_x, _st), ys = jax.lax.scan(body, (x, st), None, length=REPS)
            return jnp.sum(ys)

        jfn = jax.jit(f)
        jax.device_get(jfn(lat, st0))  # compile + warm
        return jfn

    arm_conv = make_arm(
        lambda x, st: seanet_decode_streaming(dec, cfg, x, st), True)
    arm_mm = make_arm(lambda x: seanet_decode_mm(dec, cfg, x), False)

    ms = {"conv": [], "mm": []}
    for r in range(4):
        order = (("conv", arm_conv), ("mm", arm_mm)) if r % 2 == 0 else \
            (("mm", arm_mm), ("conv", arm_conv))
        for name, jfn in order:
            t0 = time.perf_counter()
            jax.device_get(jfn(lat, st0))
            ms[name].append((time.perf_counter() - t0) / REPS * 1e3)
        print(f"# round {r}: conv {ms['conv'][-1]:.2f} ms/block  "
              f"mm {ms['mm'][-1]:.2f} ms/block", flush=True)

    conv_med = float(np.median(ms["conv"]))
    mm_med = float(np.median(ms["mm"]))
    ratio = conv_med / mm_med
    print(json.dumps({
        "metric": "mimi_layout_go_no_go",
        "value": round(ratio, 3),
        "unit": "x (production conv chain over im2col-matmul chain)",
        "conv_ms_block": round(conv_med, 3),
        "mm_ms_block": round(mm_med, 3),
        "rounds_conv": [round(x, 2) for x in ms["conv"]],
        "rounds_mm": [round(x, 2) for x in ms["mm"]],
        "go": bool(ratio >= 2.0),
        "parity_rel": float(err),
        "B": B, "F": F, "reps": REPS,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
