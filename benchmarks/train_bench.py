"""Benchmark: CSM-1B SFT training throughput on one TPU chip.

The reference publishes no training numbers (SURVEY.md §6) and its trainer
dispatches per-layer mlx ops eagerly; here the whole value_and_grad +
optimizer step is one compiled XLA program (`CSMTrainer`). This measures
that step at production scale: full csm-1b architecture, bf16 params,
random weights (step time is weight-independent), synthetic batches.

Prints ONE JSON line:
  {"metric": "train_step_csm1b", "value": <steps/sec>, ...,
   "frames_per_sec": B*(S-1)/step, "audio_sec_per_sec": frames/12.5}

Knobs (env): TRAIN_BENCH_B (default 4), TRAIN_BENCH_S (frames, default
256), TRAIN_BENCH_REPS (default 5), TRAIN_BENCH_REMAT (default 1),
TRAIN_BENCH_DLF (decoder_loss_fraction, default 1.0; Sesame's paper
uses 1/16).

Usage: `python benchmarks/train_bench.py`
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs
    from csm_mlx_tpu.models.csm import CSM, csm_1b

    b = int(os.environ.get("TRAIN_BENCH_B", "4"))
    s = int(os.environ.get("TRAIN_BENCH_S", "256"))
    reps = int(os.environ.get("TRAIN_BENCH_REPS", "5"))
    remat = os.environ.get("TRAIN_BENCH_REMAT", "1") == "1"
    dlf = float(os.environ.get("TRAIN_BENCH_DLF", "1.0"))

    args = csm_1b()
    model = CSM(args, dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))

    k = args.n_audio_codebooks + 1
    rng = np.random.RandomState(0)
    batch = {
        "tokens": rng.randint(0, args.n_audio_vocab, size=(b, s, k)).astype(
            np.int32),
        "masks": np.ones((b, s, k), dtype=np.int32),
        "loss_masks": np.ones((b, s, k), dtype=np.int32),
    }

    with tempfile.TemporaryDirectory() as td:
        trainer = CSMTrainer(TrainArgs(
            model=model,
            optimizer=optax.adamw(1e-5),
            output_dir=td,
            ckpt_freq=0,
            log_freq=0,
            gradient_checkpointing=remat,
            decoder_loss_fraction=dlf,
            learning_rate=1e-5,
        ))

        t0 = time.perf_counter()
        loss = trainer.train_step(batch)  # compile + first step
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            loss = trainer.train_step(batch)  # float() syncs
            times.append(time.perf_counter() - t0)

    best = min(times)
    frames = b * (s - 1)
    result = {
        "metric": "train_step_csm1b",
        "value": round(1.0 / best, 4),
        "unit": "steps_per_sec",
        "vs_baseline": None,  # the reference publishes no training numbers
        "step_ms": round(best * 1e3, 1),
        "frames_per_sec": round(frames / best, 1),
        "audio_sec_per_sec": round(frames / 12.5 / best, 2),
        "batch": b,
        "frames": s,
        "remat": remat,
        "decoder_loss_fraction": dlf,
        "loss": round(float(loss), 4),
        "compile_plus_first_step_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
