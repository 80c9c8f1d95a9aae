"""csm_mlx_tpu — TPU-native (JAX/XLA/Pallas) conversational speech framework.

A ground-up rebuild of the capabilities of `csm-mlx` (Sesame CSM-1B TTS on
Apple MLX) for TPU: dual-transformer CSM model, Mimi neural audio codec,
batch + streaming generation, quantization, fine-tuning (SFT/LoRA/DoRA/DPO/
KTO) with checkpoint-resume, CLI, and a voice-chat pipeline — all designed
around jit/pjit, static shapes, and device meshes.

Public surface mirrors the reference package root
(`/root/reference/csm_mlx/__init__.py:1-16`).
"""

from csm_mlx_tpu.config import (
    BACKBONE_CONFIGURATION,
    DECODER_CONFIGURATION,
    TOKENIZERS,
    LlamaConfig,
)
from csm_mlx_tpu.models.csm import CSM, ModelArgs, csm_1b
from csm_mlx_tpu.generation import (
    generate,
    generate_batch,
    generate_frame,
    generate_long,
    stream_generate,
)
from csm_mlx_tpu.ops.quant import quantize_model as quantize
from csm_mlx_tpu.ops.sampling import make_logits_processors, make_sampler
from csm_mlx_tpu.segment import Segment
from csm_mlx_tpu.watermark import detect_watermark, embed_watermark

__all__ = [
    "CSM",
    "ModelArgs",
    "csm_1b",
    "generate",
    "generate_batch",
    "generate_frame",
    "generate_long",
    "stream_generate",
    "quantize",
    "Segment",
    "make_sampler",
    "make_logits_processors",
    "embed_watermark",
    "detect_watermark",
    "LlamaConfig",
    "BACKBONE_CONFIGURATION",
    "DECODER_CONFIGURATION",
    "TOKENIZERS",
    "CSMDataset",
    "CSMTrainer",
    "TrainArgs",
    "load_adapters",
    "TTSServer",
    "ContinuousTTSServer",
    "ContinuousEngine",
]

__version__ = "0.3.0"


def __getattr__(name):
    # Lazy: the finetune stack pulls in optax/orbax; keep import light for
    # inference-only users.
    if name in ("CSMDataset", "CSMPairwiseDataset", "CSMPointwiseDataset"):
        from csm_mlx_tpu.finetune import dataset as _ds

        return getattr(_ds, name)
    if name in ("CSMTrainer", "DPOTrainer", "KTOTrainer", "TrainArgs", "DPOArgs",
                "KTOArgs"):
        from csm_mlx_tpu.finetune import trainer as _tr

        return getattr(_tr, name)
    if name == "load_adapters":
        from csm_mlx_tpu.finetune.lora import load_adapters

        return load_adapters
    if name in ("TTSServer", "ContinuousTTSServer"):
        from csm_mlx_tpu import serve as _srv

        return getattr(_srv, name)
    if name == "ContinuousEngine":
        from csm_mlx_tpu.continuous import ContinuousEngine

        return ContinuousEngine
    raise AttributeError(f"module 'csm_mlx_tpu' has no attribute {name!r}")
