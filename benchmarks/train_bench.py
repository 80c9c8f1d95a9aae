"""Benchmark: CSM-1B training throughput on one TPU chip (SFT / DPO / KTO).

The reference publishes no training numbers (SURVEY.md §6) and its trainer
dispatches per-layer mlx ops eagerly (reference csm_mlx/finetune/trainer.py:
202-318); here the whole value_and_grad + optimizer step is one compiled
XLA program (`CSMTrainer`). This measures that step at production scale:
full csm-1b architecture, bf16 params, random weights (step time is
weight-independent), synthetic batches.

Prints ONE JSON line:
  {"metric": "train_step_csm1b", "value": <steps/sec>, ...,
   "frames_per_sec": B*(S-1)/step, "audio_sec_per_sec": frames/12.5,
   "achieved_tflops": <XLA-counted>, "flop_util_pct": <vs peak>}

The utilization column is XLA-counted executed FLOPs (cost_analysis on the
compiled step) over the chip's peak — with remat ON that includes the
recompute, i.e. it is hardware FLOP utilization (HFU); with remat off the
same number is MFU. Peak defaults to v5e bf16 (197 TF), override with
TRAIN_BENCH_PEAK_TF.

Knobs (env): TRAIN_BENCH_MODE (sft|dpo|kto, default sft), TRAIN_BENCH_B
(default 4), TRAIN_BENCH_S (frames, default 256), TRAIN_BENCH_REPS
(default 5), TRAIN_BENCH_REMAT (default 1), TRAIN_BENCH_DLF
(decoder_loss_fraction, default 1.0; Sesame's paper uses 1/16 — sft only,
preference trainers reject it), CSM_TPU_FLASH_TRAIN (flash-attention
min seq len: 0=never, 1=always, default 512 — read by finetune/loss.py).

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


def _cost_analysis_flops(trainer, batch) -> float | None:
    """XLA-counted FLOPs of the compiled train step (None if unavailable).

    Lowering with the concrete arrays hits the already-built executable in
    the jit cache (and the persistent compile cache), so this is cheap.
    """
    import jax

    try:
        prepared = trainer._prepare_batch(batch)
        rng = jax.random.PRNGKey(0)
        lowered = trainer._step_fn.lower(
            trainer.model.params, trainer.opt_state_ref["opt_state"],
            prepared, rng, trainer._step_consts())
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


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

    from csm_mlx_tpu.finetune.trainer import (
        CSMTrainer, DPOArgs, DPOTrainer, KTOArgs, KTOTrainer, TrainArgs)
    from csm_mlx_tpu.models.csm import CSM, csm_1b

    mode = os.environ.get("TRAIN_BENCH_MODE", "sft").lower()
    b = int(os.environ.get("TRAIN_BENCH_B", "4"))
    s = int(os.environ.get("TRAIN_BENCH_S", "256"))
    reps = int(os.environ.get("TRAIN_BENCH_REPS", "5"))
    remat = os.environ.get("TRAIN_BENCH_REMAT", "1") == "1"
    dlf = float(os.environ.get("TRAIN_BENCH_DLF", "1.0"))
    peak_tf = float(os.environ.get("TRAIN_BENCH_PEAK_TF", "197"))

    args = csm_1b()
    model = CSM(args, dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))

    k = args.n_audio_codebooks + 1
    rng = np.random.RandomState(0)

    def _core(seed: int):
        r = np.random.RandomState(seed)
        return {
            "tokens": r.randint(0, args.n_audio_vocab, size=(b, s, k)).astype(
                np.int32),
            "masks": np.ones((b, s, k), dtype=np.int32),
            "loss_masks": np.ones((b, s, k), dtype=np.int32),
        }

    with tempfile.TemporaryDirectory() as td:
        common = dict(
            optimizer=optax.adamw(1e-5),
            output_dir=td,
            ckpt_freq=0,
            log_freq=0,
            gradient_checkpointing=remat,
            learning_rate=1e-5,
        )
        if mode == "sft":
            batch = _core(0)
            trainer = CSMTrainer(TrainArgs(
                model=model, decoder_loss_fraction=dlf, **common))
        elif mode == "dpo":
            # Preference trainers reject decoder_loss_fraction != 1.
            dlf = 1.0
            c, rj = _core(0), _core(1)
            batch = {f"chosen_{f}": c[f] for f in c}
            batch.update({f"rejected_{f}": rj[f] for f in rj})
            trainer = DPOTrainer(DPOArgs(model=model, beta=0.1, **common))
        elif mode == "kto":
            dlf = 1.0
            batch = _core(0)
            batch["preferences"] = (
                rng.randint(0, 2, size=(b,)).astype(np.int32) * 2 - 1)
            ref = CSM(args, dtype=jnp.bfloat16, rng=jax.random.PRNGKey(1))
            trainer = KTOTrainer(KTOArgs(
                model=model, reference_model=ref, beta=0.1, **common))
        else:
            raise SystemExit(f"unknown TRAIN_BENCH_MODE={mode!r}")

        t0 = time.perf_counter()
        loss = trainer.train_step(batch)  # compile + first step
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            loss = trainer.train_step(batch)  # float() syncs
            times.append(time.perf_counter() - t0)

        flops = _cost_analysis_flops(trainer, batch)

    best = min(times)
    frames = b * (s - 1)
    # DPO forwards chosen+rejected; the audio-throughput columns count the
    # trained (chosen) stream only, matching "audio seconds learned from".
    result = {
        "metric": f"train_step_csm1b_{mode}",
        "value": round(1.0 / best, 4),
        "unit": "steps_per_sec",
        "vs_baseline": None,  # the reference publishes no training numbers
        "step_ms": round(best * 1e3, 1),
        "frames_per_sec": round(frames / best, 1),
        "audio_sec_per_sec": round(frames / 12.5 / best, 2),
        "mode": mode,
        "batch": b,
        "frames": s,
        "remat": remat,
        "decoder_loss_fraction": dlf,
        "flash_train_min": os.environ.get("CSM_TPU_FLASH_TRAIN", "512"),
        "loss": round(float(loss), 4),
        "compile_plus_first_step_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    if flops is not None:
        achieved = flops / best / 1e12
        result["xla_counted_gflops_per_step"] = round(flops / 1e9, 1)
        result["achieved_tflops"] = round(achieved, 1)
        result["flop_util_pct"] = round(100.0 * achieved / peak_tf, 1)
        result["peak_tflops_assumed"] = peak_tf
    print(json.dumps(result))


if __name__ == "__main__":
    main()
