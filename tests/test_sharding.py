"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from conftest import tiny_args
from csm_mlx_tpu.models.csm import CSM
from csm_mlx_tpu.parallel import (
    create_mesh,
    csm_param_spec,
    shard_batch,
    shard_params,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_create_mesh_shapes():
    mesh = create_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}
    mesh1d = create_mesh()
    assert mesh1d.shape == {"data": 8}


def test_param_spec_rules():
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    specs = csm_param_spec(model.params)
    qspec = specs["backbone"]["layers"][0]["self_attn"]["q_proj"]["weight"]
    assert qspec == jax.sharding.PartitionSpec("model", None)
    ospec = specs["backbone"]["layers"][0]["self_attn"]["o_proj"]["weight"]
    assert ospec == jax.sharding.PartitionSpec(None, "model")
    norm = specs["backbone"]["layers"][0]["input_layernorm"]["weight"]
    assert norm == jax.sharding.PartitionSpec()


def test_tensor_parallel_forward_matches_single_device():
    """TP-sharded forward must equal the unsharded forward."""
    from csm_mlx_tpu.models.csm import masked_input_embeds
    from csm_mlx_tpu.models.llama import llama_forward
    from csm_mlx_tpu.ops.attention import causal_mask_bias
    from csm_mlx_tpu.ops.rope import rope_cache_for

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    args = model.args
    bcfg = args.backbone_config
    rng = np.random.RandomState(0)
    k = args.n_audio_codebooks + 1
    tokens = jnp.asarray(rng.randint(0, 60, size=(2, 4, k)), dtype=jnp.int32)
    mask = jnp.asarray(np.ones((2, 4, k)), dtype=jnp.int32)
    cos, sin = rope_cache_for(bcfg, 8)

    def fwd(params):
        x = masked_input_embeds(params, args, tokens, mask)
        h, _ = llama_forward(params["backbone"], bcfg, x, cos, sin,
                             jnp.arange(4)[None],
                             causal_mask_bias(4, 4)[None, None], None)
        return h

    want = np.asarray(jax.jit(fwd)(model.params))

    mesh = create_mesh({"data": 2, "model": 4})
    sharded = shard_params(model.params, mesh, tensor_parallel=True)
    got = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_tp_generation_matches_single_device():
    """Public-API tensor/batch-parallel generation (generate_tokens_batch
    with mesh=) must produce the same greedy tokens as single-device."""
    from csm_mlx_tpu.generation import generate_tokens_batch
    from csm_mlx_tpu.parallel import shard_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    model.params["audio_head"] = (
        jax.random.normal(jax.random.PRNGKey(7),
                          model.params["audio_head"].shape) * 0.1
    )
    rng = np.random.RandomState(0)
    k = model.args.n_audio_codebooks + 1
    prompts = [rng.randint(0, 60, (10, k)).astype(np.int32) for _ in range(2)]
    masks = [np.ones_like(p) for p in prompts]

    want, n_want = generate_tokens_batch(model, prompts, masks, 4,
                                         temperature=0.0)

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    got, n_got = generate_tokens_batch(model, prompts, masks, 4,
                                       temperature=0.0, mesh=mesh)
    np.testing.assert_array_equal(n_got, n_want)
    np.testing.assert_array_equal(got, want)


def test_quantized_tp_generation_matches_solo_quantized():
    """W8A8 under a mesh (VERDICT r3 item 2): quantized TP generation must
    produce EXACTLY the solo-quantized greedy tokens. The decode matvecs
    route through jax.shard_map over "model" (ops/quant.py::
    _quant_linear_tp): out-sharded projections keep per-channel arithmetic
    untouched, in-sharded ones all-reduce raw int32 partials (exact) before
    the affine fixup — both bit-identical to the single-device mirror."""
    from csm_mlx_tpu.generation import generate_tokens_batch
    from csm_mlx_tpu.ops.quant import quantize_model
    from csm_mlx_tpu.parallel import shard_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(4))
    model.params["audio_head"] = (
        jax.random.normal(jax.random.PRNGKey(8),
                          model.params["audio_head"].shape) * 0.1
    )
    quantize_model(model, mode="w8a8", min_size=1)
    rng = np.random.RandomState(1)
    k = model.args.n_audio_codebooks + 1
    prompts = [rng.randint(0, 60, (10, k)).astype(np.int32)
               for _ in range(2)]
    masks = [np.ones_like(p) for p in prompts]

    want, n_want = generate_tokens_batch(model, prompts, masks, 4,
                                         temperature=0.0)

    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    # The sharded quantized leaves actually landed sharded (not silently
    # replicated by a rule gap).
    wq = model.params["backbone"]["layers"][0]["self_attn"]["qkv_proj"][
        "weight_q"]
    assert "model" in str(wq.sharding.spec)
    got, n_got = generate_tokens_batch(model, prompts, masks, 4,
                                       temperature=0.0, mesh=mesh)
    np.testing.assert_array_equal(n_got, n_want)
    np.testing.assert_array_equal(got, want)


def test_single_prompt_generation_on_data_mesh():
    """B=1 generate_tokens on a data>1 mesh must replicate the batch dim
    rather than fail device_put's divisibility check."""
    from csm_mlx_tpu.generation import generate_tokens
    from csm_mlx_tpu.parallel import shard_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(5))
    rng = np.random.RandomState(0)
    k = model.args.n_audio_codebooks + 1
    prompt = rng.randint(0, 60, (10, k)).astype(np.int32)
    mask = np.ones_like(prompt)
    mesh = create_mesh({"data": 2, "model": 4})
    shard_model(model, mesh)
    frames, n = generate_tokens(model, prompt, mask, 3, temperature=0.0,
                                mesh=mesh)
    assert frames.shape == (3, model.args.n_audio_codebooks) and n == 3


def test_data_parallel_train_step():
    """One DP train step on a 8-way data mesh runs and updates params."""
    from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs
    from test_trainer import _batch

    mesh = create_mesh({"data": 8})
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(2))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        trainer = CSMTrainer(TrainArgs(
            model=model, optimizer=optax.sgd(1e-3), output_dir=td,
            ckpt_freq=0, mesh=mesh, learning_rate=1e-3,
        ))
        batch = _batch(model.args, b=8, s=6)
        loss = trainer.train_step(batch)
        assert np.isfinite(loss)
        # The ragged final batch of an epoch (here 3 rows on an 8-way data
        # axis) must pad by cycling rows, not crash device_put.
        ragged = {k: v[:3] for k, v in batch.items()}
        loss2 = trainer.train_step(ragged)
        assert np.isfinite(loss2)


def test_shard_params_indivisible_vocab_replicates():
    """The real CSM-1B vocab (2051) divides no model-axis size: sharding
    must fall back to replication for those tensors instead of raising
    (jax.device_put rejects uneven shards)."""
    from conftest import tiny_args as _tiny

    args = _tiny()
    args = type(args)(backbone_name=args.backbone_name,
                      decoder_name=args.decoder_name,
                      n_text_vocab=args.n_text_vocab,
                      n_audio_vocab=51,  # prime-ish: not divisible by 2 or 4
                      n_audio_codebooks=args.n_audio_codebooks)
    model = CSM(args, dtype=jnp.float32, rng=jax.random.PRNGKey(5))
    mesh = create_mesh({"data": 2, "model": 4})
    sharded = shard_params(model.params, mesh, tensor_parallel=True)  # no raise
    spec = sharded["codebook0_head"]["weight"].sharding.spec
    assert all(s is None for s in spec), spec  # replicated fallback
    # evenly divisible tensors stay tensor-sharded
    qspec = sharded["backbone"]["layers"][0]["self_attn"]["q_proj"][
        "weight"].sharding.spec
    assert qspec[0] == "model", qspec


def test_kto_reference_model_is_sharded_too(monkeypatch, tmp_path):
    """The frozen KTO reference enters the loss as jit constants; it must
    carry the same FSDP placement as the policy params or a full unsharded
    copy replicates onto every chip (defeating ZeRO-3's memory saving)."""
    import csm_mlx_tpu.parallel.mesh as mesh_mod
    from csm_mlx_tpu.finetune.trainer import KTOArgs, KTOTrainer
    from test_trainer import _batch

    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_BYTES", 1024)
    mesh = create_mesh({"data": 8})
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(7))
    ref = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(8))
    trainer = KTOTrainer(KTOArgs(
        model=model, optimizer=optax.sgd(1e-3), output_dir=tmp_path / "kto",
        ckpt_freq=0, reference_model=ref, beta=0.1, mesh=mesh,
        learning_rate=1e-3, param_sharding="fsdp"))
    w = trainer.reference_model.params["backbone"]["layers"][0]["mlp"][
        "gate_proj"]["weight"]
    assert "data" in tuple(w.sharding.spec), w.sharding.spec
    batch = _batch(tiny_args(), b=8, s=6)
    batch["preferences"] = np.asarray([1, -1] * 4, dtype=np.int32)
    assert np.isfinite(trainer.train_step(batch))


def test_fsdp_train_step_matches_replicated(monkeypatch):
    """FSDP (params + opt state stored sharded over "data") computes the
    same loss/updates as plain replicated DP, and the Adam moments really
    are sharded (the ZeRO memory claim)."""
    import tempfile

    import csm_mlx_tpu.parallel.mesh as mesh_mod
    from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs
    from test_trainer import _batch

    # tiny-model weights are all < the production 64KB replicate-small
    # threshold; drop it so the storage-sharding path is actually exercised
    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_BYTES", 1024)

    mesh = create_mesh({"data": 8})
    batch = _batch(tiny_args(), b=8, s=6)

    def run(param_sharding):
        model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(7))
        with tempfile.TemporaryDirectory() as td:
            trainer = CSMTrainer(TrainArgs(
                model=model, optimizer=optax.adam(1e-3), output_dir=td,
                ckpt_freq=0, mesh=mesh, learning_rate=1e-3,
                param_sharding=param_sharding,
            ))
            losses = [trainer.train_step(batch) for _ in range(2)]
            return losses, trainer

    losses_rep, _ = run("replicated")
    losses_fsdp, trainer = run("fsdp")
    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=2e-5)

    # storage really is sharded: a large 2-D param and its Adam moment
    w = trainer.model.params["backbone"]["layers"][0]["mlp"]["gate_proj"][
        "weight"]
    assert "data" in tuple(w.sharding.spec), w.sharding.spec
    mu = jax.tree.leaves(trainer.opt_state_ref["opt_state"],
                         is_leaf=lambda x: hasattr(x, "sharding"))
    sharded_leaves = [x for x in mu
                      if hasattr(x, "sharding") and hasattr(x, "ndim")
                      and x.ndim >= 2
                      and any(s == "data" for s in x.sharding.spec)]
    assert sharded_leaves, "no sharded optimizer-state leaves found"

def test_tp_spec_on_dataonly_mesh_falls_back_to_replication():
    """shard_params with tensor_parallel=True on a mesh WITHOUT a 'model'
    axis must replicate (the documented indivisible/absent-axis fallback),
    not raise NamedSharding's missing-axis error."""
    from csm_mlx_tpu.parallel.mesh import shard_params

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    mesh = create_mesh({"data": 8})  # no "model" axis
    sharded = shard_params(model.params, mesh, tensor_parallel=True)
    spec = sharded["backbone"]["layers"][0]["self_attn"]["q_proj"][
        "weight"].sharding.spec
    assert all(s is None for s in spec), spec
