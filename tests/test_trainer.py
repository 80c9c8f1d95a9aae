"""Loss + trainer tests: semantics checks, checkpoint/resume parity,
DPO/KTO smoke, LoRA freezing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from conftest import tiny_args
from csm_mlx_tpu.finetune.loss import compute_loss
from csm_mlx_tpu.finetune.trainer import (
    CSMTrainer,
    DPOArgs,
    DPOTrainer,
    KTOArgs,
    KTOTrainer,
    TrainArgs,
)
from csm_mlx_tpu.models.csm import CSM


def _batch(args, b=2, s=6, seed=0):
    rng = np.random.RandomState(seed)
    k = args.n_audio_codebooks + 1
    tokens = rng.randint(0, args.n_audio_vocab, size=(b, s, k)).astype(np.int32)
    masks = np.ones((b, s, k), dtype=np.int32)
    # last row of each sample is padding
    masks[:, -1] = 0
    loss_masks = np.ones((b, s, k), dtype=np.int32)
    return {"tokens": tokens, "masks": masks, "loss_masks": loss_masks}


@pytest.fixture(scope="module")
def model():
    return CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))


def test_loss_finite_and_positive(model):
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    loss = compute_loss(model.params, model.args, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_loss_fcw_scaling(model):
    """c0 term scales linearly with first_codebook_weight_multiplier."""
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    l1 = float(compute_loss(model.params, model.args, batch,
                            first_codebook_weight_multiplier=1.0))
    l2 = float(compute_loss(model.params, model.args, batch,
                            first_codebook_weight_multiplier=2.0))
    l0 = float(compute_loss(model.params, model.args, batch,
                            first_codebook_weight_multiplier=0.0))
    np.testing.assert_allclose(l2 - l1, l1 - l0, rtol=1e-4)


def test_loss_per_sample_matches_mean_shape(model):
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    ps = compute_loss(model.params, model.args, batch, per_sample=True)
    assert ps.shape == (2,)
    assert np.all(np.isfinite(np.asarray(ps)))


def test_loss_mask_respected(model):
    """Zeroing a sample's loss mask must change the total loss."""
    b = _batch(model.args)
    full = float(compute_loss(model.params, model.args,
                              {k: jnp.asarray(v) for k, v in b.items()}))
    b2 = dict(b)
    lm = b["loss_masks"].copy()
    lm[0] = 0
    b2["loss_masks"] = lm
    masked = float(compute_loss(model.params, model.args,
                                {k: jnp.asarray(v) for k, v in b2.items()}))
    assert abs(full - masked) > 1e-6


def test_cause_mismatch_changes_loss(model):
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    a = float(compute_loss(model.params, model.args, batch))
    b = float(compute_loss(model.params, model.args, batch,
                           cause_mismatch=True))
    assert abs(a - b) > 1e-6


def _reference_loss(params, args, batch, *, cause_mismatch=False, fcw=1.0):
    """Independent port of the reference compute_loss (trainer.py:202-318):
    per-codebook python loop, embeddings stacked per codebook, and the
    cause_mismatch roll applied to the CE *targets only*, after the decoder
    forward is built from the unrolled tokens."""
    from csm_mlx_tpu.models.csm import embed_audio, embed_tokens
    from csm_mlx_tpu.models.llama import llama_forward
    from csm_mlx_tpu.ops.attention import causal_mask_bias
    from csm_mlx_tpu.ops.layers import linear
    from csm_mlx_tpu.ops.rope import rope_cache_for

    tokens, masks, loss_masks = (batch["tokens"], batch["masks"],
                                 batch["loss_masks"])
    b, s, _ = tokens.shape
    n_cb = args.n_audio_codebooks
    shifted = tokens[:, 1:, :-1]
    valid = (masks[:, 1:, :-1] & loss_masks[:, 1:, :-1]).astype(jnp.float32)

    emb = embed_tokens(params, args, tokens)
    backbone_in = (emb * masks[..., None].astype(emb.dtype)).sum(-2)[:, :-1]
    cos_b, sin_b = rope_cache_for(args.backbone_config, s)
    hidden, _ = llama_forward(
        params["backbone"], args.backbone_config, backbone_in, cos_b, sin_b,
        jnp.arange(s - 1)[None], causal_mask_bias(s - 1, s - 1)[None, None],
        None)

    # Decoder teacher-forcing inputs from the UNROLLED shifted tokens.
    ci_stacked = jnp.stack(
        [embed_audio(params, args, i, shifted[:, :, i]) for i in range(n_cb)],
        axis=-2)
    dec_in = jnp.concatenate([hidden[:, :, None, :], ci_stacked], axis=-2)
    dec_in = dec_in.reshape(-1, n_cb + 1, dec_in.shape[-1])
    cos_d, sin_d = rope_cache_for(args.decoder_config, n_cb + 1)
    dec_hidden, _ = llama_forward(
        params["decoder"], args.decoder_config,
        linear(params["projection"], dec_in), cos_d, sin_d,
        jnp.arange(n_cb + 1)[None],
        causal_mask_bias(n_cb + 1, n_cb + 1)[None, None], None)
    dec_hidden = dec_hidden.reshape(b, s - 1, n_cb + 1, -1)[:, :, 1:-1, :]

    targets = shifted
    if cause_mismatch:  # roll applied to targets only (trainer.py:271-274)
        targets = jnp.concatenate([shifted[:, 1:], shifted[:, :1]], axis=1)

    def ce(logits, tgt):
        logits = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        return logz - jnp.take_along_axis(logits, tgt[..., None], -1)[..., 0]

    c0_logits = linear(params["codebook0_head"], hidden)
    c0 = (ce(c0_logits, targets[:, :, 0]) * valid[:, :, 0]).sum() \
        / valid[:, :, 0].sum() * fcw
    total = c0 / n_cb
    for i in range(1, n_cb):
        li = jnp.einsum("bsd,dv->bsv",
                        dec_hidden[:, :, i - 1, :].astype(jnp.float32),
                        params["audio_head"][i - 1].astype(jnp.float32))
        ci = (ce(li, targets[:, :, i]) * valid[:, :, i]).sum() \
            / valid[:, :, i].sum()
        total = total + ci / n_cb
    return float(total)


@pytest.mark.parametrize("cause_mismatch", [False, True])
def test_loss_matches_reference_port(model, cause_mismatch):
    """compute_loss == an independent line-by-line port of the reference
    algorithm, incl. the targets-only cause_mismatch roll."""
    params = dict(model.params)
    # random audio_head so codebooks 1..31 actually contribute
    params["audio_head"] = jax.random.normal(
        jax.random.PRNGKey(5), model.params["audio_head"].shape
    ).astype(model.params["audio_head"].dtype) * 0.05
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    ours = float(compute_loss(params, model.args, batch,
                              cause_mismatch=cause_mismatch))
    ref = _reference_loss(params, model.args, batch,
                          cause_mismatch=cause_mismatch)
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_decoder_loss_fraction_runs(model):
    batch = {k: jnp.asarray(v) for k, v in _batch(model.args).items()}
    loss = compute_loss(model.params, model.args, batch,
                        decoder_loss_fraction=0.5,
                        rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


from csm_mlx_tpu.finetune.dataset import CSMDataset  # noqa: E402


class _FakeDataset(CSMDataset):
    """In-memory pre-tokenized dataset (skips Mimi/text tokenizers)."""

    def __init__(self, args, n=4):
        super().__init__([])
        self.items = [_batch(args, b=1, s=6, seed=i) for i in range(n)]

    def __len__(self):
        return len(self.items)

    def get_batch(self, indices):
        parts = [self.items[i] for i in indices]
        return {k: np.concatenate([p[k] for p in parts], axis=0)
                for k in parts[0]}


def _fake_ds(args, n=4):
    return _FakeDataset(args, n)


def test_sft_training_reduces_loss(tmp_path):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    args = TrainArgs(
        model=model,
        optimizer=optax.adam(1e-3),
        output_dir=tmp_path / "run",
        ckpt_freq=0,
        learning_rate=1e-3,
    )
    trainer = CSMTrainer(args)
    ds = _fake_ds(model.args)
    batch = ds.get_batch([0, 1])
    losses = [trainer.train_step(batch) for _ in range(5)]
    assert losses[-1] < losses[0]


def test_checkpoint_save_and_resume(tmp_path):
    out = tmp_path / "ckpt_run"
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(2))
    args = TrainArgs(model=model, optimizer=optax.adam(1e-3), output_dir=out,
                     ckpt_freq=1, log_freq=1, learning_rate=1e-3)
    trainer = CSMTrainer(args)
    ds = _fake_ds(model.args)
    trainer.train(ds, batch_size=2, epochs=1, shuffle=False)
    step_after = trainer.state.step
    assert (out / "latest.safetensors").exists()
    assert (out / "trainer_state.json").exists()
    assert (out / f"step_{step_after}").exists()

    # Fresh trainer on the same dir resumes state.
    model2 = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(99))
    trainer2 = CSMTrainer(TrainArgs(model=model2, optimizer=optax.adam(1e-3),
                                    output_dir=out, learning_rate=1e-3))
    assert trainer2.state.step == step_after
    assert trainer2.state.epoch == 1
    # Weights restored (same params as saved, not the fresh random ones).
    np.testing.assert_allclose(
        np.asarray(model2.params["projection"]["weight"]),
        np.asarray(model.params["projection"]["weight"]), rtol=1e-6,
    )


def test_resume_at_exact_epoch_boundary_skips_epoch(tmp_path):
    """A checkpoint taken at the LAST step of an epoch (crash before the
    end-of-epoch save bumps state.epoch) must resume as 'epoch done', not
    re-train the whole epoch from batch 0."""
    out = tmp_path / "boundary_run"
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    args = TrainArgs(model=model, optimizer=optax.adam(1e-3), output_dir=out,
                     ckpt_freq=2, log_freq=1, learning_rate=1e-3)
    trainer = CSMTrainer(args)
    ds = _fake_ds(model.args)  # 4 samples, batch 2 -> 2 steps/epoch
    # Simulate the crash window: 2 steps trained (the full epoch), periodic
    # checkpoint committed at step 2, but epoch never bumped.
    trainer.train_step(ds.get_batch([0, 1]))
    trainer.train_step(ds.get_batch([2, 3]))
    trainer.state.step = 2
    trainer.state.epoch = 0
    trainer.checkpointer.save()

    model2 = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(9))
    trainer2 = CSMTrainer(TrainArgs(model=model2, optimizer=optax.adam(1e-3),
                                    output_dir=out, learning_rate=1e-3))
    assert trainer2.state.step == 2 and trainer2.state.epoch == 0
    trainer2.train(ds, batch_size=2, epochs=1, shuffle=False)
    # Epoch 0 was already complete: no batch may re-run (step stays 2).
    assert trainer2.state.step == 2
    assert trainer2.state.epoch == 1


def test_dpo_trainer_step(tmp_path):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    trainer = DPOTrainer(DPOArgs(model=model, optimizer=optax.sgd(1e-3),
                                 output_dir=tmp_path / "dpo", ckpt_freq=0,
                                 beta=0.1))
    b = _batch(model.args, b=2, s=5, seed=7)
    batch = {}
    for k, v in b.items():
        batch[f"chosen_{k}"] = v
        batch[f"rejected_{k}"] = _batch(model.args, b=2, s=5, seed=8)[k]
    loss = trainer.train_step(batch)
    assert np.isfinite(loss)


def test_kto_trainer_step(tmp_path):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(4))
    ref = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(5))
    trainer = KTOTrainer(KTOArgs(model=model, optimizer=optax.sgd(1e-3),
                                 output_dir=tmp_path / "kto", ckpt_freq=0,
                                 reference_model=ref, beta=0.1))
    b = _batch(model.args, b=2, s=5, seed=9)
    b["preferences"] = np.asarray([1, -1], dtype=np.int32)
    loss = trainer.train_step(b)
    assert np.isfinite(loss)


def test_kto_requires_reference(tmp_path):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(6))
    with pytest.raises(ValueError, match="Reference model"):
        KTOTrainer(KTOArgs(model=model, optimizer=optax.sgd(1e-3),
                           output_dir=tmp_path / "kto2"))


def test_preference_trainers_reject_decoder_loss_fraction(tiny_model):
    """decoder_loss_fraction subsamples decoder rows — incompatible with the
    per-sample losses preference trainers compare, so it must be rejected
    loudly rather than silently ignored."""
    import optax
    import pytest as _pytest

    from csm_mlx_tpu.finetune.trainer import DPOArgs, DPOTrainer

    args = DPOArgs(model=tiny_model, optimizer=optax.sgd(1e-3),
                   output_dir="/tmp/dpo_reject_test",
                   decoder_loss_fraction=0.5)
    with _pytest.raises(ValueError, match="decoder_loss_fraction"):
        DPOTrainer(args)


def test_epoch_shuffle_is_seeded_per_epoch():
    """Mid-epoch resume must recreate the same permutation the interrupted
    epoch used (per-epoch seeding; the reference shuffles unseeded and
    silently double-trains on resume)."""
    import numpy as _np

    p0a = _np.random.RandomState(1234 + 0).permutation(_np.arange(16))
    p0b = _np.random.RandomState(1234 + 0).permutation(_np.arange(16))
    p1 = _np.random.RandomState(1234 + 1).permutation(_np.arange(16))
    assert (p0a == p0b).all()
    assert not (p0a == p1).all()


def test_checkpoint_orbax_backend_save_and_resume(tmp_path):
    """checkpoint_backend='orbax': async tensor IO, same step_N/run-root
    layout and trainer_state.json resume schema as the safetensors path."""
    out = tmp_path / "orbax_run"
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(2))
    args = TrainArgs(model=model, optimizer=optax.adam(1e-3), output_dir=out,
                     ckpt_freq=1, log_freq=1, learning_rate=1e-3,
                     checkpoint_backend="orbax")
    trainer = CSMTrainer(args)
    ds = _fake_ds(model.args)
    trainer.train(ds, batch_size=2, epochs=1, shuffle=False)
    step_after = trainer.state.step
    assert (out / "trainer_state.json").exists()  # advisory run-root json
    assert (out / f"step_{step_after}" / "orbax").exists()
    assert (out / f"step_{step_after}" / "trainer_state.json").exists()

    model2 = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(99))
    trainer2 = CSMTrainer(TrainArgs(
        model=model2, optimizer=optax.adam(1e-3), output_dir=out,
        learning_rate=1e-3, checkpoint_backend="orbax"))
    assert trainer2.state.step == step_after
    assert trainer2.state.epoch == 1
    np.testing.assert_allclose(
        np.asarray(model2.params["projection"]["weight"]),
        np.asarray(model.params["projection"]["weight"]), rtol=1e-6,
    )
    # optimizer state restored too (adam mu exists and is finite)
    leaves = [l for l in jax.tree.leaves(trainer2.opt_state_ref["opt_state"])
              if hasattr(l, "shape")]
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # crash-consistency: a step dir with json but NO committed orbax dir
    # (crash during the async tensor write) must be skipped on resume
    import shutil

    fake = out / f"step_{step_after + 5}"
    fake.mkdir()
    shutil.copy(out / f"step_{step_after}" / "trainer_state.json",
                fake / "trainer_state.json")
    model3 = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(7))
    trainer3 = CSMTrainer(TrainArgs(
        model=model3, optimizer=optax.adam(1e-3), output_dir=out,
        learning_rate=1e-3, checkpoint_backend="orbax"))
    assert trainer3.state.step == step_after  # not the phantom step

    # backend mismatch fails loudly instead of resuming state over
    # missing weights
    model4 = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(8))
    with pytest.raises(ValueError, match="orbax"):
        CSMTrainer(TrainArgs(model=model4, optimizer=optax.adam(1e-3),
                             output_dir=out, learning_rate=1e-3))


def test_orbax_run_without_committed_step_rejected_by_safetensors(tmp_path):
    """An orbax run that crashed before its FIRST tensor commit leaves only
    json files; a safetensors-backend resume must refuse rather than
    restore step/epoch over fresh random weights."""
    import json as _json

    out = tmp_path / "crashed_orbax"
    (out / "step_1").mkdir(parents=True)
    state = {"trainer_state": {"step": 1, "epoch": 0, "loss": 0.0,
                               "learning_rate": 1e-3},
             "history": []}
    for p in (out / "trainer_state.json",
              out / "step_1" / "trainer_state.json"):
        p.write_text(_json.dumps(state))

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(9))
    with pytest.raises(ValueError, match="orbax"):
        CSMTrainer(TrainArgs(model=model, optimizer=optax.adam(1e-3),
                             output_dir=out, learning_rate=1e-3))
