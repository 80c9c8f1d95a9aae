"""Shared plumbing for the finetune CLI commands.

Flag surface parity with `/root/reference/csm_mlx/cli/finetune/
{full_finetune,lora_finetune}.py` — argparse instead of typer."""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import List, Optional

import optax

from csm_mlx_tpu.cli.config import MODEL
from csm_mlx_tpu.models.csm import CSM


def add_common_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data-path", required=True, type=Path,
                   help="Path to JSON dataset file")
    p.add_argument("--output-dir", "-o", required=True, type=Path,
                   help="Directory to save checkpoints and logs")
    p.add_argument("--model", "-m", choices=list(MODEL), default="1b")
    p.add_argument("--pretrained-path", type=Path, default=None,
                   help="Path to pretrained weights (default: download)")
    p.add_argument("--max-audio-length-ms", type=int, default=None)
    p.add_argument("--mask-speaker-ids", type=int, nargs="*", default=None)
    p.add_argument("--batch-size", "-b", type=int, default=4)
    p.add_argument("--epochs", "-e", type=int, default=5)
    p.add_argument("--learning-rate", "--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", "--wd", type=float, default=1e-4)
    p.add_argument("--max-norm", type=float, default=0.0,
                   help="Max norm for gradient clipping (0.0 to disable)")
    p.add_argument("--first-codebook-weight-multiplier", "--fcw",
                   type=float, default=1.0)
    p.add_argument("--ckpt-freq", "--ckpt_freq", type=int, default=100)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--gradient-ckpt", action="store_true", default=False)
    p.add_argument("--optimizer", choices=["adam", "sgd", "adamw"],
                   default="adamw")
    p.add_argument("--decoder-loss-fraction", type=float, default=1.0,
                   help="Fraction of frame positions for the decoder loss "
                        "(Sesame compute amortization; 1.0 = full)")
    p.add_argument("--data-parallel", action="store_true", default=False,
                   help="Shard the batch over all local devices")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="Also shard parameter + optimizer-state storage "
                        "over the devices (ZeRO-3; implies --data-parallel)")


def build_optimizer(name: str, learning_rate: float, weight_decay: float):
    if name == "adam":
        if weight_decay > 0:
            print(f"Warning: Weight decay {weight_decay} requested for Adam "
                  f"optimizer; Adam does not support it. Ignoring.")
        return optax.adam(learning_rate)
    if name == "sgd":
        opt = optax.sgd(learning_rate)
        if weight_decay > 0:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
        return opt
    if name == "adamw":
        return optax.adamw(learning_rate, weight_decay=weight_decay)
    raise SystemExit(f"Error: Invalid optimizer choice {name}")


def load_model(args: argparse.Namespace) -> CSM:
    print("Initializing model...")
    model_config = MODEL[args.model]
    csm_model = CSM(model_config["config"], init=False)
    if args.pretrained_path:
        print(f"Loading pretrained weights from {args.pretrained_path}")
        csm_model.load_weights(str(args.pretrained_path))
    else:
        print("Using pretrained weights from Hugging Face...")
        from csm_mlx_tpu.loaders import resolve_weight_path

        try:
            weight = resolve_weight_path(model_config["loader"]["repo_id"],
                                         model_config["loader"]["filename"])
            csm_model.load_weights(weight)
        except Exception as e:
            # The model was built with init=False: there are no random
            # weights to "continue with" — params is None and training
            # would crash much later inside jit tracing. Fail here, loudly.
            raise SystemExit(
                f"Error: could not obtain pretrained weights ({e}); pass "
                f"--pretrained-path to fine-tune from a local checkpoint"
            ) from e
    return csm_model


def make_mesh_if_requested(args: argparse.Namespace):
    if not (getattr(args, "data_parallel", False)
            or getattr(args, "fsdp", False)):
        return None
    from csm_mlx_tpu.parallel import create_mesh

    return create_mesh()


def param_sharding_mode(args: argparse.Namespace) -> str:
    return "fsdp" if getattr(args, "fsdp", False) else "replicated"


def load_dataset(cls, args: argparse.Namespace, n_audio_codebooks: int):
    print(f"Loading dataset from {args.data_path}")
    dataset = cls.from_json(
        str(args.data_path),
        n_audio_codebooks=n_audio_codebooks,
        max_audio_length_ms=args.max_audio_length_ms,
        mask_speaker_ids=args.mask_speaker_ids,
    )
    print(f"Loaded {len(dataset)} samples")
    if len(dataset) == 0:
        raise SystemExit("Error: Dataset is empty. Please check the data "
                         "path and format.")
    if len(dataset) < args.batch_size:
        print(f"Warning: Dataset size ({len(dataset)}) is smaller than batch "
              f"size ({args.batch_size}). Consider reducing batch size.")
    return dataset
