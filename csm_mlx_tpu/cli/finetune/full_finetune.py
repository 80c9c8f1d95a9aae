"""`csm-tpu finetune full {sft,dpo,kto}` — parity with
`/root/reference/csm_mlx/cli/finetune/full_finetune.py:26-839`."""

from __future__ import annotations

import argparse
import os

from csm_mlx_tpu.cli.finetune.common import (
    add_common_train_flags,
    build_optimizer,
    load_dataset,
    load_model,
    make_mesh_if_requested,
    param_sharding_mode,
)


def add_parser(subparsers) -> None:
    p = subparsers.add_parser("full", help="Full-parameter finetuning")
    sub = p.add_subparsers(dest="mode", required=True)

    sft = sub.add_parser("sft", help="Full SFT finetuning for CSM models.")
    add_common_train_flags(sft)
    sft.add_argument("--freeze-backbone", action="store_true", default=False)
    sft.add_argument("--freeze-decoder", action="store_true", default=False)
    sft.set_defaults(func=run_sft)

    dpo = sub.add_parser("dpo", help="Full DPO finetuning for CSM models.")
    add_common_train_flags(dpo)
    dpo.add_argument("--freeze-backbone", action="store_true", default=False)
    dpo.add_argument("--freeze-decoder", action="store_true", default=False)
    dpo.add_argument("--beta", type=float, default=0.1)
    dpo.set_defaults(func=run_dpo)

    kto = sub.add_parser("kto", help="Full KTO finetuning for CSM models.")
    add_common_train_flags(kto)
    kto.add_argument("--freeze-backbone", action="store_true", default=False)
    kto.add_argument("--freeze-decoder", action="store_true", default=False)
    kto.add_argument("--beta", type=float, default=0.1)
    kto.add_argument("--desirable-weight", type=float, default=1.0)
    kto.add_argument("--undesirable-weight", type=float, default=1.0)
    kto.set_defaults(func=run_kto)


def _freeze_filter(args):
    """Trainable-path predicate implementing --freeze-backbone/decoder."""
    fb = getattr(args, "freeze_backbone", False)
    fd = getattr(args, "freeze_decoder", False)
    if not (fb or fd):
        return None

    def flt(path: str) -> bool:
        if fb and path.startswith("backbone."):
            return False
        if fd and path.startswith("decoder."):
            return False
        return True

    return flt


def _common_train_args(args, model):
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
        trainable_filter=_freeze_filter(args),
    )


def _run_train(trainer, dataset, args, model) -> None:
    print(f"Starting training for {args.epochs} epochs, batch size "
          f"{args.batch_size}")
    trainer.train(dataset=dataset, batch_size=args.batch_size,
                  epochs=args.epochs)
    print("\nTraining complete!")
    final = args.output_dir / "final_model.safetensors"
    print(f"Saving final model weights to {final}...")
    model.save_weights(str(final))
    print("Final model saved.")


def run_sft(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMDataset
    from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args)
    trainer = CSMTrainer(TrainArgs(**_common_train_args(args, model)))
    dataset = load_dataset(CSMDataset, args, model.n_audio_codebooks)
    _run_train(trainer, dataset, args, model)


def run_dpo(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMPairwiseDataset
    from csm_mlx_tpu.finetune.trainer import DPOArgs, DPOTrainer

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args)
    trainer = DPOTrainer(DPOArgs(**_common_train_args(args, model),
                                 beta=args.beta))
    dataset = load_dataset(CSMPairwiseDataset, args, model.n_audio_codebooks)
    _run_train(trainer, dataset, args, model)


def run_kto(args: argparse.Namespace) -> None:
    from csm_mlx_tpu.finetune.dataset import CSMPointwiseDataset
    from csm_mlx_tpu.finetune.trainer import KTOArgs, KTOTrainer

    os.makedirs(args.output_dir, exist_ok=True)
    model = load_model(args)
    print("Building frozen reference model...")
    reference = load_model(args)
    trainer = KTOTrainer(KTOArgs(
        **_common_train_args(args, model),
        reference_model=reference,
        beta=args.beta,
        desirable_weight=args.desirable_weight,
        undesirable_weight=args.undesirable_weight,
    ))
    dataset = load_dataset(CSMPointwiseDataset, args, model.n_audio_codebooks)
    _run_train(trainer, dataset, args, model)
