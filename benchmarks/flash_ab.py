"""Interleaved A/B: differentiable flash attention vs masked-einsum sdpa
in the training step (VERDICT r2 item 3 'done' criterion).

Both arms are the SAME compiled value_and_grad + adamw step over the same
csm-1b bf16 params — only the backbone attention implementation differs
(CSM_TPU_FLASH_TRAIN flipped at trace time). Arms alternate A/B/A/B inside
one process: the shared chip's throughput drift (up to 3x between runs)
makes any other comparison unreadable (see PERFORMANCE.md).

Env knobs: FLASH_AB_B (default 4), FLASH_AB_S (default 1024),
FLASH_AB_ROUNDS (default 3), FLASH_AB_DLF (default 0.0625 = Sesame's 1/16 —
keeps the teacher-forced decoder from drowning the backbone-attention
signal), FLASH_AB_REMAT (default 1).

Prints one JSON line with per-arm step times and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
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

    from csm_mlx_tpu.finetune.loss import compute_loss
    from csm_mlx_tpu.models.csm import CSM, csm_1b

    b = int(os.environ.get("FLASH_AB_B", "4"))
    s = int(os.environ.get("FLASH_AB_S", "1024"))
    rounds = int(os.environ.get("FLASH_AB_ROUNDS", "3"))
    dlf = float(os.environ.get("FLASH_AB_DLF", "0.0625"))
    remat = os.environ.get("FLASH_AB_REMAT", "1") == "1"

    args = csm_1b()
    model = CSM(args, dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    # sgd: no optimizer moments — two arms alternate in one process, and
    # returning scalars keeps grads/updates internal to the program (the
    # attention-path cost under comparison is all in value_and_grad).
    opt = optax.sgd(1e-5)
    opt_state = opt.init(model.params)

    k = args.n_audio_codebooks + 1
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(
            rng.randint(0, args.n_audio_vocab, size=(b, s, k)), jnp.int32),
        "masks": jnp.ones((b, s, k), jnp.int32),
        "loss_masks": jnp.ones((b, s, k), jnp.int32),
    }

    def build_step(flash: bool):
        # compute_loss reads CSM_TPU_FLASH_TRAIN at *trace* time.
        os.environ["CSM_TPU_FLASH_TRAIN"] = "512" if flash else "0"

        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(
                lambda p: compute_loss(
                    p, args, batch, decoder_loss_fraction=dlf,
                    remat=remat, rng=key)
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            # scalars only: a full updated-params output tree would hold a
            # second 2.7 GB copy live next to the inputs (OOM on 16 GB HBM
            # with both arms resident); the update math stays in-program.
            return loss, optax.global_norm(updates)

        fn = jax.jit(step)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(model.params, opt_state, key))
        compile_s = time.perf_counter() - t0
        return fn, compile_s

    key = jax.random.PRNGKey(2)
    step_flash, c_f = build_step(True)
    step_einsum, c_e = build_step(False)
    print(f"# compile: flash {c_f:.1f}s einsum {c_e:.1f}s", file=sys.stderr)

    times = {"flash": [], "einsum": []}
    for r in range(rounds):
        for name, fn in (("flash", step_flash), ("einsum", step_einsum)):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            loss, gnorm = fn(model.params, opt_state, sub)
            jax.block_until_ready((loss, gnorm))
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"# round {r} {name}: {dt*1e3:.0f} ms loss={float(loss):.4f}",
                  file=sys.stderr)

    med = {k2: sorted(v)[len(v) // 2] for k2, v in times.items()}
    result = {
        "metric": "train_flash_vs_einsum",
        "value": round(med["einsum"] / med["flash"], 3),
        "unit": "x_speedup_flash_over_einsum",
        "flash_step_ms": round(med["flash"] * 1e3, 1),
        "einsum_step_ms": round(med["einsum"] * 1e3, 1),
        "batch": b, "frames": s, "decoder_loss_fraction": dlf,
        "remat": remat, "rounds": rounds,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
