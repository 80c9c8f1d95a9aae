"""`csm-tpu generate` — flag surface parity with
`/root/reference/csm_mlx/cli/generate.py:72-202` (argparse instead of typer;
typer is not available in this image).

Notably this CLI passes `sampler=` to `generate` and it *works* — the
reference shipped with a TypeError there (SURVEY.md §2.1); we implement the
documented surface."""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from typing import Optional

from csm_mlx_tpu.cli.config import MODEL


def parse_weight_argument(value: str) -> str:
    """HF repo id or local path -> weight file (cli/generate.py:19-49).

    Resolution order (incl. the per-directory candidate filenames) lives in
    `loaders.resolve_weight_path` — one copy; the CLI only translates
    failures to SystemExit."""
    from csm_mlx_tpu.loaders import resolve_weight_path

    looks_like_repo = re.match(
        r"^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$", value) and not Path(value).exists()
    if not looks_like_repo and not Path(value).exists():
        raise SystemExit(f"Error: Path '{value}' does not exist")
    try:
        return resolve_weight_path(value)
    except FileNotFoundError as e:
        raise SystemExit(f"Error: {e}")


def parse_adapter_argument(value: Optional[str]) -> Optional[str]:
    if value is None:
        return None
    required = ["adapter_config.json", "adapters.safetensors"]
    path = Path(value)
    if path.is_dir() and all((path / f).exists() for f in required):
        return str(path.resolve())
    if re.match(r"^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$", value):
        from huggingface_hub import snapshot_download

        try:
            snap = Path(snapshot_download(value))
        except Exception:
            snap = None
        # The repo may download fine yet not BE an adapter — check the
        # required files here so the user gets the CLI's message, not a
        # raw FileNotFoundError from load_adapters.
        if snap is not None and all((snap / f).exists() for f in required):
            return str(snap)
    raise SystemExit(
        f"Error: No required adapter files ({required}) found in {value}"
    )


def add_parser(subparsers) -> None:
    p = subparsers.add_parser(
        "generate", help="Generate speech from text using CSM.")
    p.add_argument("text")
    p.add_argument("--output", "-o", required=True, type=Path,
                   help="Output audio file path")
    p.add_argument("--model", choices=list(MODEL), default="1b",
                   help="Model size")
    p.add_argument("--weight", "-w", default="senstella/csm-1b-mlx",
                   help="Weight file path (HF repo ID or local path)")
    p.add_argument("--adapter", "-a", default=None,
                   help="Path to adapter dir (adapter_config.json + "
                        "adapters.safetensors)")
    p.add_argument("--speaker", "-s", type=int, default=0, help="Speaker ID")
    p.add_argument("--max-audio-length", "-l", type=int, default=10_000,
                   help="Maximum audio length in milliseconds")
    p.add_argument("--temperature", "--temp", "-t", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--min-p", type=float, default=None)
    p.add_argument("--top-k", "-k", type=int, default=50)
    p.add_argument("--min-tokens-to-keep", type=int, default=1)
    p.add_argument("--input-speakers", "-is", type=int, nargs="*", default=[],
                   help="Speaker IDs for context segments")
    p.add_argument("--input-audios", "-ia", type=Path, nargs="*", default=[],
                   help="Audio files for context segments")
    p.add_argument("--input-texts", "-it", nargs="*", default=[],
                   help="Transcripts for context segments")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--watermark-key", type=int, default=None,
                   help="Embed a keyed spread-spectrum watermark in the "
                        "output (verify with csm_mlx_tpu.detect_watermark)")
    p.add_argument("--long", action="store_true",
                   help="Long-form mode: split the text into sentences and "
                        "synthesize each with a rolling voice context — "
                        "text length is not bound by the model context "
                        "window (--max-audio-length then caps each "
                        "sentence, not the total)")
    p.add_argument("--pause-ms", type=float, default=0.0,
                   help="Silence inserted between sentences in --long mode")
    p.set_defaults(func=run)


def run(args: argparse.Namespace) -> None:
    if len(args.input_audios) != len(args.input_texts) or \
            len(args.input_audios) != len(args.input_speakers):
        print("Error! All context inputs (input_audios, input_texts, and "
              "input_speakers) must have the same length.", file=sys.stderr)
        raise SystemExit(1)

    import jax

    from csm_mlx_tpu import CSM, Segment, generate, make_sampler
    from csm_mlx_tpu.finetune.lora import load_adapters
    from csm_mlx_tpu.utils.audio import write_audio

    sampler = make_sampler(
        temp=args.temperature,
        top_p=args.top_p or 0.0,
        min_p=args.min_p or 0.0,
        top_k=args.top_k or 0,
        min_tokens_to_keep=args.min_tokens_to_keep,
    )

    model_config = MODEL[args.model]
    sampling_rate = model_config.get("sampling_rate", 24000)
    weight = parse_weight_argument(args.weight)
    adapter = parse_adapter_argument(args.adapter)

    print("Loading model...")
    csm = CSM(model_config["config"], init=False)
    csm.load_weights(weight)
    if adapter is not None:
        load_adapters(csm, adapter)

    context = [
        Segment(speaker, text, None, audio)
        for audio, text, speaker in zip(
            args.input_audios, args.input_texts, args.input_speakers)
    ]

    print("Inferencing...")
    key = jax.random.PRNGKey(args.seed) if args.seed is not None else None
    if args.long:
        from csm_mlx_tpu.generation import generate_long

        result = generate_long(
            csm, args.text, args.speaker, context,
            max_segment_audio_ms=args.max_audio_length, sampler=sampler,
            key=key, watermark_key=args.watermark_key,
            pause_ms=args.pause_ms)
    else:
        result = generate(csm, args.text, args.speaker, context,
                          args.max_audio_length, sampler=sampler, key=key,
                          watermark_key=args.watermark_key)
    write_audio(result, args.output, sampling_rate)
    print(f"Success! Audio saved to: {args.output}")
