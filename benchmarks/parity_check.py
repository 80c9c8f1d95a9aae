"""Golden-parity harness vs the MLX reference checkpoint (SURVEY.md §4).

Offline-friendly: this environment has no network, so the script takes
local paths. With the real artifacts available it checks the two parity
gates from BASELINE.md:

  1. greedy-decode token parity: fixed prompt -> the 32-codebook token
     stream must match a reference dump exactly;
  2. Mimi waveform RMSE < 1e-3: decode the same codes with this framework's
     Mimi vs a reference waveform.

Usage:
  python benchmarks/parity_check.py \
      --weights ckpt.safetensors \
      --mimi-weights tokenizer-e351c8d8-checkpoint125.safetensors \
      --text "Hello from Sesame." --speaker 0 \
      [--ref-tokens ref_tokens.npy] [--ref-audio ref_audio.npy]

  # produce this framework's outputs for cross-checking on a Mac:
  python benchmarks/parity_check.py ... --dump out_prefix
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
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
    args = ap.parse_args()

    os.environ["CSM_TPU_MIMI_WEIGHTS"] = args.mimi_weights

    import jax.numpy as jnp

    from csm_mlx_tpu import CSM, csm_1b
    from csm_mlx_tpu.generation import _assemble_prompt, generate_tokens
    from csm_mlx_tpu.tokenizers import decode_audio

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
