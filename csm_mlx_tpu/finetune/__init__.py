"""Fine-tuning: datasets, losses, trainers (SFT/DPO/KTO), LoRA/DoRA,
checkpointing — parity with /root/reference/csm_mlx/finetune/."""

from csm_mlx_tpu.finetune.dataset import (
    CSMDataset,
    CSMPairwiseDataset,
    CSMPointwiseDataset,
)
from csm_mlx_tpu.finetune.trainer import (
    CSMTrainer,
    DPOArgs,
    DPOTrainer,
    KTOArgs,
    KTOTrainer,
    TrainArgs,
)
from csm_mlx_tpu.finetune.lora import linear_to_lora_layers, load_adapters

__all__ = [
    "CSMDataset",
    "CSMPairwiseDataset",
    "CSMPointwiseDataset",
    "CSMTrainer",
    "DPOTrainer",
    "KTOTrainer",
    "TrainArgs",
    "DPOArgs",
    "KTOArgs",
    "linear_to_lora_layers",
    "load_adapters",
]
