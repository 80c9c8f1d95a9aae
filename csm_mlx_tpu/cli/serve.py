"""`csm-tpu serve` — run the dynamic-batching TTS HTTP server.

No reference counterpart (the reference is a single-user library); this is
the TPU serving layer over `csm_mlx_tpu.serve.TTSServer`. Model/weight/
adapter resolution mirrors `csm-tpu generate`.
"""

from __future__ import annotations

import argparse


def add_parser(subparsers) -> None:
    p = subparsers.add_parser(
        "serve", help="Serve batched TTS over HTTP (POST /tts).")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    from csm_mlx_tpu.cli.config import MODEL

    p.add_argument("--model", choices=list(MODEL), default="1b")
    p.add_argument("--weight", "-w", default="senstella/csm-1b-mlx",
                   help="HF repo or local weight path")
    p.add_argument("--adapter", "-a", default=None,
                   help="LoRA adapter dir (adapter_config.json + adapters.safetensors)")
    p.add_argument("--quantize", action="store_true",
                   help="Quantize to the W8A8 fast path before serving")
    p.add_argument("--max-batch", type=int, default=64,
                   help="Coalesce up to this many concurrent requests "
                        "(default = the resident kernel's per-call batch, "
                        "the measured serving sweet spot)")
    p.add_argument("--max-pending", type=int, default=256,
                   help="Reject (HTTP 503) new requests past this many "
                        "already queued — bounds worst-case latency "
                        "instead of growing it without limit")
    p.add_argument("--transfer", choices=("int16", "float32"),
                   default="int16",
                   help="Device->host waveform transfer dtype. int16 halves "
                        "the transfer bytes and is lossless for the HTTP "
                        "endpoints (they emit 16-bit PCM anyway)")
    p.add_argument("--max-wait-ms", type=float, default=30.0,
                   help="How long to hold the first request for batchmates")
    p.add_argument("--max-audio-length", "-l", type=int, default=30_000,
                   help="Max generated audio per request (ms)")
    p.add_argument("--temperature", "--temp", "-t", type=float, default=0.8)
    p.add_argument("--watermark-key", type=int, default=None,
                   help="Watermark every generated waveform with this key")
    p.add_argument("--continuous", action="store_true",
                   help="Continuous batching: per-slot admission into one "
                        "always-running batched frame loop (finished rows "
                        "recycle immediately; best under mixed lengths)")
    p.add_argument("--quantize-codec", action="store_true",
                   help="Continuous mode: W8A8 Mimi decode path (int8 "
                        "SEANet convs + codec-transformer linears on the "
                        "MXU; adds codec quantization noise only). "
                        "Measured NEGATIVE on the shared v5e (1.36x "
                        "slower than f32) -- kept as a hedge for "
                        "locally-attached TPUs where int8 convs may pay")
    p.add_argument("--slots", type=int, default=64,
                   help="Continuous mode: concurrent generation slots "
                        "(64 measured 1.13x per-row over 48 at the step-"
                        "block level, 48 1.48x over 16 — "
                        "benchmarks/slots_ab.py + PERFORMANCE.md round 5; "
                        "80+ exceeds the resident kernel's VMEM)")
    p.add_argument("--mesh", default=None, metavar="AXES",
                   help="Multi-chip serving: mesh axes as 'data=2,model=4' "
                        "(sizes must multiply to the local device count). "
                        "Shards the model over 'model' and request rows / "
                        "slots over 'data'. Composes with --quantize: W8A8 "
                        "matvecs run per-shard through shard_map over "
                        "'model' (the single-chip VMEM-resident frame "
                        "kernel is dropped — it does not partition)")
    p.set_defaults(func=run)


def parse_mesh_argument(spec: str) -> "dict[str, int]":
    """'data=2,model=4' -> {"data": 2, "model": 4} (axis order preserved —
    it defines the device layout; "model" innermost rides the fastest ICI)."""
    axes: dict = {}
    for part in spec.split(","):
        name, _, size = part.partition("=")
        name = name.strip()
        if not name or not size.strip().isdigit() or int(size) < 1:
            raise ValueError(
                f"bad mesh axis {part!r} in --mesh {spec!r}; expected "
                f"NAME=SIZE pairs like 'data=2,model=4'")
        if name in axes:
            raise ValueError(
                f"duplicate mesh axis {name!r} in --mesh {spec!r}")
        axes[name] = int(size.strip())
    return axes


def run(args: argparse.Namespace) -> None:
    import asyncio

    from csm_mlx_tpu import CSM, quantize
    from csm_mlx_tpu.cli.config import MODEL
    from csm_mlx_tpu.cli.generate import (
        parse_adapter_argument,
        parse_weight_argument,
    )
    from csm_mlx_tpu.finetune.lora import load_adapters
    from csm_mlx_tpu.serve import ContinuousTTSServer, TTSServer, serve_http

    try:
        mesh_axes = parse_mesh_argument(args.mesh) if args.mesh else None
    except ValueError as e:
        raise SystemExit(f"csm-tpu serve: {e}")

    model_config = MODEL[args.model]
    weight = parse_weight_argument(args.weight)
    adapter = parse_adapter_argument(args.adapter)

    print("Loading model...")
    csm = CSM(model_config["config"], init=False)
    csm.load_weights(weight)
    if adapter is not None:
        load_adapters(csm, adapter)
    if args.quantize:
        quantize(csm, mode="w8a8")

    mesh = None
    if mesh_axes is not None:
        from csm_mlx_tpu.parallel import create_mesh, shard_model

        try:
            mesh = create_mesh(mesh_axes)
        except ValueError as e:
            raise SystemExit(f"csm-tpu serve: {e}")
        shard_model(csm, mesh)

    if args.quantize_codec and not args.continuous:
        raise SystemExit(
            "csm-tpu serve: --quantize-codec requires --continuous "
            "(the lockstep server decodes through the shared f32 codec)")
    if args.continuous:
        server = ContinuousTTSServer(
            csm, n_slots=args.slots,
            max_audio_length_ms=args.max_audio_length,
            temperature=args.temperature, watermark_key=args.watermark_key,
            max_pending=args.max_pending, transfer=args.transfer,
            quantize_codec=args.quantize_codec, mesh=mesh,
        )
    else:
        server = TTSServer(
            csm, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            max_audio_length_ms=args.max_audio_length,
            temperature=args.temperature, watermark_key=args.watermark_key,
            transfer=args.transfer, max_pending=args.max_pending,
            mesh=mesh,
        )

    async def main():
        http = await serve_http(server, host=args.host, port=args.port)
        port = http.sockets[0].getsockname()[1]
        print(f"Serving TTS on http://{args.host}:{port} "
              f"(POST /tts, GET /healthz, GET /stats)")
        async with http:
            await http.serve_forever()

    asyncio.run(main())
