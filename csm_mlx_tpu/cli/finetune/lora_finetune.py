"""`csm-tpu finetune lora {sft,dpo,kto}` — parity with
`/root/reference/csm_mlx/cli/finetune/lora_finetune.py:29-1026`."""

from __future__ import annotations

import argparse
import json
import os

from csm_mlx_tpu.cli.finetune.common import (
    add_common_train_flags,
    build_optimizer,
    load_dataset,
    load_model,
    make_mesh_if_requested,
    param_sharding_mode,
)


def _add_lora_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--target-modules", nargs="*",
                   default=["attn", "codebook0_head", "projection"],
                   help="Module names to apply LoRA to")
    p.add_argument("--train-embeddings", action="store_true", default=False,
                   help="Train embedding layers directly (not via LoRA)")
    p.add_argument("--use-dora", action="store_true", default=False)


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("lora", help="LoRA/DoRA finetuning")
    sub = p.add_subparsers(dest="mode", required=True)

    sft = sub.add_parser("sft", help="LoRA SFT finetuning for CSM models.")
    add_common_train_flags(sft)
    _add_lora_flags(sft)
    sft.set_defaults(func=run_sft)

    dpo = sub.add_parser("dpo", help="LoRA DPO finetuning for CSM models.")
    add_common_train_flags(dpo)
    _add_lora_flags(dpo)
    dpo.add_argument("--beta", type=float, default=0.1)
    dpo.set_defaults(func=run_dpo)

    kto = sub.add_parser("kto", help="LoRA KTO finetuning for CSM models.")
    add_common_train_flags(kto)
    _add_lora_flags(kto)
    kto.add_argument("--beta", type=float, default=0.1)
    kto.add_argument("--desirable-weight", type=float, default=1.0)
    kto.add_argument("--undesirable-weight", type=float, default=1.0)
    kto.set_defaults(func=run_kto)


def _apply_lora(args, model):
    from csm_mlx_tpu.finetune.lora import linear_to_lora_layers, trainable_filter

    target_modules = list(args.target_modules)
    embedding_targets = [t for t in target_modules if "embeddings" in t]
    if args.train_embeddings and embedding_targets:
        print("Warning: Both --train-embeddings and embedding modules in "
              "--target-modules detected; removing embedding modules from "
              "target_modules")
        target_modules = [t for t in target_modules if "embeddings" not in t]

    if args.lora_rank < 1:
        raise SystemExit(f"Error: --lora-rank must be >= 1, got {args.lora_rank}")
    print(f"Applying LoRA with rank={args.lora_rank}, alpha={args.lora_alpha}")
    print(f"Target modules: {target_modules}")
    lora_config = {
        "rank": args.lora_rank,
        "scale": args.lora_alpha / args.lora_rank,
        "dropout": 0.0,
        "keys": target_modules,
    }
    linear_to_lora_layers(model, config=lora_config, use_dora=args.use_dora)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "adapter_config.json"), "w") as f:
        json.dump({"lora_parameters": lora_config,
                   "fine_tune_type": "dora" if args.use_dora else "lora"},
                  f, indent=2)

    if args.train_embeddings:
        def flt(path: str) -> bool:
            return trainable_filter(path) or path in (
                "text_embeddings.weight", "audio_embeddings.weight")
        return lora_config, flt
    return lora_config, trainable_filter


def _common_train_args(args, model, flt):
    return dict(
        model=model,
        optimizer=build_optimizer(args.optimizer, args.learning_rate,
                                  args.weight_decay),
        output_dir=args.output_dir,
        max_norm=args.max_norm,
        first_codebook_weight_multiplier=args.first_codebook_weight_multiplier,
        gradient_checkpointing=args.gradient_ckpt,
        ckpt_freq=args.ckpt_freq,
        log_freq=args.log_freq,
        learning_rate=args.learning_rate,
        decoder_loss_fraction=getattr(args, "decoder_loss_fraction", 1.0),
        mesh=make_mesh_if_requested(args),
        param_sharding=param_sharding_mode(args),
        trainable_filter=flt,
        only_save_trainable_params=True,
    )


def _finish(args, model, flt) -> None:
    from csm_mlx_tpu.finetune.lora import save_adapter_weights

    final = args.output_dir / "adapters.safetensors"
    print(f"Saving final adapter weights to {final}...")
    save_adapter_weights(model, final, weight_filter=flt)
    print("Final adapters saved.")


def run_sft(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMDataset
    from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs

    model = load_model(args)
    _, flt = _apply_lora(args, model)
    trainer = CSMTrainer(TrainArgs(**_common_train_args(args, model, flt)))
    dataset = load_dataset(CSMDataset, args, model.n_audio_codebooks)
    trainer.train(dataset=dataset, batch_size=args.batch_size,
                  epochs=args.epochs)
    print("\nTraining complete!")
    _finish(args, model, flt)


def run_dpo(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMPairwiseDataset
    from csm_mlx_tpu.finetune.trainer import DPOArgs, DPOTrainer

    model = load_model(args)
    _, flt = _apply_lora(args, model)
    trainer = DPOTrainer(DPOArgs(**_common_train_args(args, model, flt),
                                 beta=args.beta))
    dataset = load_dataset(CSMPairwiseDataset, args, model.n_audio_codebooks)
    trainer.train(dataset=dataset, batch_size=args.batch_size,
                  epochs=args.epochs)
    print("\nTraining complete!")
    _finish(args, model, flt)


def run_kto(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMPointwiseDataset
    from csm_mlx_tpu.finetune.trainer import KTOArgs, KTOTrainer

    model = load_model(args)
    print("Building frozen reference model (pre-LoRA weights)...")
    reference = load_model(args)
    _, flt = _apply_lora(args, model)
    trainer = KTOTrainer(KTOArgs(
        **_common_train_args(args, model, flt),
        reference_model=reference,
        beta=args.beta,
        desirable_weight=args.desirable_weight,
        undesirable_weight=args.undesirable_weight,
    ))
    dataset = load_dataset(CSMPointwiseDataset, args, model.n_audio_codebooks)
    trainer.train(dataset=dataset, batch_size=args.batch_size,
                  epochs=args.epochs)
    print("\nTraining complete!")
    _finish(args, model, flt)
