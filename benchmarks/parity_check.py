"""Golden-parity harness vs the MLX reference checkpoint (SURVEY.md §4).

Offline-friendly: this environment has no network, so the script takes
local paths. With the real artifacts available it checks the two parity
gates from BASELINE.md:

  1. greedy-decode token parity: fixed prompt -> the 32-codebook token
     stream must match a reference dump exactly;
  2. Mimi waveform RMSE < 1e-3: decode the same codes with this framework's
     Mimi vs a reference waveform;
  3. standalone Mimi encode/decode gates (--mimi-gate): encode a reference
     input waveform -> codes must match a reference dump; decode reference
     codes -> waveform RMSE < 1e-3. Runs without the CSM checkpoint, so the
     kyutai Mimi weights can be validated the moment they are obtainable.

Usage:
  python benchmarks/parity_check.py \
      --weights ckpt.safetensors \
      --mimi-weights tokenizer-e351c8d8-checkpoint125.safetensors \
      --text "Hello from Sesame." --speaker 0 \
      [--ref-tokens ref_tokens.npy] [--ref-audio ref_audio.npy]

  # produce this framework's outputs for cross-checking on a Mac:
  python benchmarks/parity_check.py ... --dump out_prefix

  # validate the harness machinery itself (no real weights needed):
  # random model saved in the reference layout -> dump -> fresh reload ->
  # regenerate -> byte-compare against the dump. Proves the weight
  # save/load roundtrip, deterministic generation, and the compare gates
  # all work before the real checkpoint ever arrives.
  python benchmarks/parity_check.py --self-test
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def self_test() -> None:
    """End-to-end machinery validation with synthetic weights (zero-egress
    friendly): dump from one model instance, reload the checkpoint into a
    FRESH instance, re-run both gates against the dump — both must PASS."""
    import subprocess
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    import csm_mlx_tpu.tokenizers as tok_mod
    from csm_mlx_tpu.loaders import params_to_reference_flat
    from csm_mlx_tpu.models.csm import CSM, csm_1b

    class _FakeTok:
        bos_token = "<b>"; eos_token = "<e>"
        bos_token_id = 1; eos_token_id = 2

        def encode(self, t):
            return [1] + [3 + (ord(c) % 50) for c in t[:24]] + [2]

    tok_mod.get_text_tokenizer = lambda path=None: _FakeTok()
    tok_mod.get_audio_tokenizer.cache_clear()

    model = CSM(csm_1b(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    model.params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(3), model.params["audio_head"].shape,
        jnp.float32) * 0.02
    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "ckpt.safetensors")
        flat = params_to_reference_flat(model.params)
        save_file({k: np.asarray(v) for k, v in flat.items()}, ckpt)
        del model

        common = [sys.executable, os.path.abspath(__file__),
                  "--weights", ckpt, "--mimi-weights", "RANDOM",
                  "--max-audio-length-ms", "480", "--self-test-tokenizer"]
        dump = os.path.join(td, "run_a")
        r1 = subprocess.run(common + ["--dump", dump], check=True)
        r2 = subprocess.run(
            common + ["--ref-tokens", f"{dump}_tokens.npy",
                      "--ref-audio", f"{dump}_audio.npy"])
        if r2.returncode != 0:
            print("SELF-TEST FAIL: fresh reload did not reproduce the dump")
            sys.exit(1)

        # Mimi-gate machinery: encode+decode dump from one process, re-run
        # the gates against the dump in a fresh process -> both must PASS.
        wav = np.sin(np.linspace(0, 40 * np.pi, 24_000)).astype(np.float32)
        wav_path = os.path.join(td, "tone.npy")
        np.save(wav_path, wav)
        mdump = os.path.join(td, "mimi_a")
        mcommon = [sys.executable, os.path.abspath(__file__), "--mimi-gate",
                   "--mimi-weights", "RANDOM", "--cpu",
                   "--mimi-audio-in", wav_path]
        subprocess.run(mcommon + ["--dump", mdump], check=True)
        subprocess.run([*mcommon[:-2], "--mimi-audio-in", wav_path,
                        "--dump", f"{mdump}2",
                        "--ref-mimi-codes", f"{mdump}_mimi_codes.npy"],
                       check=True)
        # The decoded dump is written by the SECOND run (the first has no
        # ref codes to decode), under its own "<mdump>2" prefix.
        r3 = subprocess.run(
            mcommon + ["--ref-mimi-codes", f"{mdump}_mimi_codes.npy",
                       "--ref-mimi-decoded", f"{mdump}2_mimi_decoded.npy"])
        if r3.returncode != 0:
            print("SELF-TEST FAIL: mimi gate did not reproduce its own dump")
            sys.exit(1)
        print("SELF-TEST PASS: save -> reload -> regenerate matches "
              "(token parity + RMSE + standalone Mimi gates exercised "
              "end-to-end)")


def mimi_gate(args) -> None:
    """Standalone Mimi parity gates (no CSM checkpoint needed).

    encode gate:  --mimi-audio-in (npy float waveform or wav) -> codes must
                  exactly match --ref-mimi-codes (npy (K, F) int).
    decode gate:  decode --ref-mimi-codes -> waveform RMSE vs
                  --ref-mimi-decoded (npy float) < 1e-3.
    --dump prefix writes <prefix>_mimi_codes.npy / _mimi_decoded.npy for
    cross-checking on a machine that can run the moshi reference.
    """
    import jax.numpy as jnp

    from csm_mlx_tpu.tokenizers import decode_audio, get_audio_tokenizer

    tok = get_audio_tokenizer()
    ok = True
    codes = None
    if args.mimi_audio_in:
        if args.mimi_audio_in.endswith(".npy"):
            wav = np.load(args.mimi_audio_in).astype(np.float32).reshape(-1)
        else:
            from csm_mlx_tpu.utils.audio import read_audio

            wav = np.asarray(read_audio(args.mimi_audio_in, 24_000))
        codes = np.asarray(tok.encode(jnp.asarray(wav)[None, None]))[0]
        print(f"encoded {wav.shape[0]} samples -> codes {codes.shape}")
        if args.dump:
            np.save(f"{args.dump}_mimi_codes.npy", codes)
    if args.ref_mimi_codes:
        ref_codes = np.load(args.ref_mimi_codes)
        if codes is not None:
            f = min(codes.shape[-1], ref_codes.shape[-1])
            eq = float((codes[..., :f] == ref_codes[..., :f]).mean())
            print(f"encode code agreement over {f} frames: {eq:.4%} "
                  f"({'PASS' if eq == 1.0 else 'FAIL'})")
            ok &= eq == 1.0
        decoded = np.asarray(
            decode_audio(jnp.asarray(ref_codes[None], jnp.int32)))[0, 0]
        if args.dump:
            np.save(f"{args.dump}_mimi_decoded.npy", decoded)
        if args.ref_mimi_decoded:
            ref_wav = np.load(args.ref_mimi_decoded)
            m = min(len(ref_wav), len(decoded))
            rmse = float(np.sqrt(np.mean((decoded[:m] - ref_wav[:m]) ** 2)))
            print(f"decode RMSE over {m} samples: {rmse:.2e} "
                  f"({'PASS' if rmse < 1e-3 else 'FAIL'} @ 1e-3)")
            ok &= rmse < 1e-3
    sys.exit(0 if ok else 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    if "--self-test" in sys.argv:
        self_test()
        return
    ap.add_argument("--weights", default=None)
    ap.add_argument("--mimi-weights", required=True)
    ap.add_argument("--text", default="Hello from Sesame.")
    ap.add_argument("--speaker", type=int, default=0)
    ap.add_argument("--max-audio-length-ms", type=float, default=5000)
    ap.add_argument("--ref-tokens", default=None,
                    help=".npy int array (F, 32) from the MLX reference")
    ap.add_argument("--ref-audio", default=None,
                    help=".npy float waveform from the MLX reference")
    ap.add_argument("--dump", default=None,
                    help="prefix: write <prefix>_tokens.npy/_audio.npy")
    ap.add_argument("--self-test-tokenizer", action="store_true",
                    help=argparse.SUPPRESS)  # internal: offline fake tok
    ap.add_argument("--mimi-gate", action="store_true",
                    help="run only the standalone Mimi encode/decode gates")
    ap.add_argument("--mimi-audio-in", default=None,
                    help="waveform (npy or wav, 24 kHz) to encode")
    ap.add_argument("--ref-mimi-codes", default=None,
                    help=".npy (K, F) int codes from the moshi reference")
    ap.add_argument("--ref-mimi-decoded", default=None,
                    help=".npy float waveform the reference decodes to")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    if args.mimi_weights == "RANDOM":  # self-test: random-init codec
        os.environ["HF_HUB_OFFLINE"] = "1"
    else:
        os.environ["CSM_TPU_MIMI_WEIGHTS"] = args.mimi_weights

    import jax

    if args.self_test_tokenizer or args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.mimi_gate:
        mimi_gate(args)
        return
    if not args.weights:
        ap.error("--weights is required unless --mimi-gate is given")
    import jax.numpy as jnp

    from csm_mlx_tpu import CSM, csm_1b
    from csm_mlx_tpu.generation import _assemble_prompt, generate_tokens
    from csm_mlx_tpu.tokenizers import decode_audio

    if args.self_test_tokenizer:
        import csm_mlx_tpu.tokenizers as tok_mod

        class _FakeTok:
            bos_token = "<b>"; eos_token = "<e>"
            bos_token_id = 1; eos_token_id = 2

            def encode(self, t):
                return [1] + [3 + (ord(c) % 50) for c in t[:24]] + [2]

        tok_mod.get_text_tokenizer = lambda path=None: _FakeTok()

    model = CSM(csm_1b(), dtype=jnp.float32)  # fp32 for bit-stable parity
    model.load_weights(args.weights)

    prompt, mask = _assemble_prompt(model, args.text, args.speaker, ())
    frames, n = generate_tokens(
        model, prompt, mask, int(args.max_audio_length_ms / 80),
        temperature=0.0,
    )
    print(f"generated {n} frames")

    codes = jnp.asarray(frames.T[None], dtype=jnp.int32)
    audio = np.asarray(decode_audio(codes))[0, 0]

    if args.dump:
        np.save(f"{args.dump}_tokens.npy", frames)
        np.save(f"{args.dump}_audio.npy", audio)
        print(f"dumped {args.dump}_tokens.npy / _audio.npy")

    ok = True
    if args.ref_tokens:
        ref = np.load(args.ref_tokens)
        m = min(len(ref), len(frames))
        match = np.array_equal(frames[:m], ref[:m])
        print(f"token parity over {m} frames: {'PASS' if match else 'FAIL'}")
        ok &= match
    if args.ref_audio:
        ref = np.load(args.ref_audio)
        m = min(len(ref), len(audio))
        rmse = float(np.sqrt(np.mean((audio[:m] - ref[:m]) ** 2)))
        print(f"waveform RMSE over {m} samples: {rmse:.2e} "
              f"({'PASS' if rmse < 1e-3 else 'FAIL'} @ 1e-3)")
        ok &= rmse < 1e-3
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
