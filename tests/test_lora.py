"""LoRA/DoRA adapter tests: structure, freezing, fuse, file roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from conftest import tiny_args
from csm_mlx_tpu.finetune.lora import (
    effective_weight,
    fuse_lora,
    linear_to_lora_layers,
    load_adapters,
    save_adapters,
    trainable_filter,
)
from csm_mlx_tpu.finetune.trainer import CSMTrainer, TrainArgs
from csm_mlx_tpu.loaders import tree_to_flat
from csm_mlx_tpu.models.csm import CSM


def _lora_model(seed=0, use_dora=False, rank=2):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(seed))
    linear_to_lora_layers(model, {"rank": rank, "scale": 2.0, "dropout": 0.0,
                                  "keys": ["attn"]}, use_dora=use_dora)
    return model


def test_lora_structure_added():
    model = _lora_model()
    flat = tree_to_flat(model.params)
    lora_keys = [k for k in flat if k.endswith("lora_a")]
    # q/k/v/o + gate/up/down on every layer of backbone (2) + decoder (2)
    assert len(lora_keys) == 7 * 4
    assert any(k.startswith("backbone.") for k in lora_keys)
    assert any(k.startswith("decoder.") for k in lora_keys)


def test_lora_zero_init_preserves_forward(tiny_model):
    """With B=0, the adapted weight equals the base weight."""
    model = _lora_model(seed=42)
    p = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    w_eff = effective_weight(p)
    np.testing.assert_allclose(np.asarray(w_eff), np.asarray(p["weight"]),
                               rtol=1e-6)


def test_dora_init_preserves_forward():
    model = _lora_model(seed=1, use_dora=True)
    p = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    w_eff = effective_weight(p)
    np.testing.assert_allclose(np.asarray(w_eff), np.asarray(p["weight"]),
                               rtol=1e-5, atol=1e-6)


def test_lora_training_only_updates_adapters(tmp_path):
    from test_trainer import _fake_ds

    model = _lora_model(seed=2)
    before = {k: np.asarray(v).copy() for k, v in
              tree_to_flat(model.params).items()}
    trainer = CSMTrainer(TrainArgs(
        model=model, optimizer=optax.adam(1e-2), output_dir=tmp_path / "lora",
        ckpt_freq=0, trainable_filter=trainable_filter,
        only_save_trainable_params=True, learning_rate=1e-2,
    ))
    ds = _fake_ds(model.args)
    trainer.train_step(ds.get_batch([0, 1]))
    after = tree_to_flat(model.params)
    changed = [k for k in before
               if not np.allclose(before[k], np.asarray(after[k]))]
    assert changed, "something must have trained"
    for k in changed:
        assert trainable_filter(k), f"frozen param {k} changed"


def test_adapter_save_load_roundtrip(tmp_path):
    model = _lora_model(seed=3)
    # perturb adapters so the roundtrip is non-trivial
    p = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    p["lora_b"] = jnp.ones_like(p["lora_b"]) * 0.1
    cfg = {"rank": 2, "scale": 2.0, "dropout": 0.0, "keys": ["attn"]}
    save_adapters(model, str(tmp_path / "adapters"), cfg)

    fresh = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    load_adapters(fresh, str(tmp_path / "adapters"))
    q = fresh.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    np.testing.assert_allclose(np.asarray(q["lora_b"]),
                               np.asarray(p["lora_b"]), rtol=1e-6)


def test_lora_dropout_perturbs_training_loss(tmp_path):
    """dropout>0 makes the per-step loss rng-dependent; dropout=0 doesn't
    (mlx_lm LoRALinear parity: dropout on the adapter input, train-time
    only)."""
    from test_trainer import _fake_ds

    def build(dropout):
        model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(7))
        linear_to_lora_layers(model, {"rank": 2, "scale": 2.0,
                                      "dropout": dropout, "keys": ["attn"]})
        # non-zero B so the adapter branch actually contributes
        for part in ("backbone", "decoder"):
            for layer in model.params[part]["layers"]:
                q = layer["self_attn"]["q_proj"]
                q["lora_b"] = jnp.ones_like(q["lora_b"]) * 0.2
        return model

    ds = _fake_ds(tiny_args())
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch([0, 1]).items()}

    model = build(0.5)
    assert "lora_dropout" in \
        model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    trainer = CSMTrainer(TrainArgs(
        model=model, optimizer=optax.adam(1e-2), output_dir=tmp_path / "d",
        ckpt_freq=0, trainable_filter=trainable_filter, learning_rate=1e-2,
    ))
    l1 = trainer._loss_fn(model.params, batch, jax.random.PRNGKey(0))
    l2 = trainer._loss_fn(model.params, batch, jax.random.PRNGKey(1))
    assert not np.allclose(float(l1), float(l2)), \
        "dropout>0 must make the loss depend on the rng"

    model0 = build(0.0)
    trainer0 = CSMTrainer(TrainArgs(
        model=model0, optimizer=optax.adam(1e-2), output_dir=tmp_path / "d0",
        ckpt_freq=0, trainable_filter=trainable_filter, learning_rate=1e-2,
    ))
    l3 = trainer0._loss_fn(model0.params, batch, jax.random.PRNGKey(0))
    l4 = trainer0._loss_fn(model0.params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l3), float(l4), rtol=1e-6)


def test_lora_conversion_rejects_quantized_and_fused_models():
    """Converting AFTER quantize/fuse silently adapted nothing (and
    load_adapters then merged adapters into dicts applied at the wrong
    scale or never read) — it must raise instead."""
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    quantize_model(model, mode="w8a8", min_size=1, fuse=False)
    with pytest.raises(ValueError, match="BEFORE quantize"):
        linear_to_lora_layers(model, {"rank": 2, "keys": ["attn"]})

    fused = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(4))
    from csm_mlx_tpu.models.llama import fuse_layer_weights

    fuse_layer_weights(fused.params["backbone"])
    fuse_layer_weights(fused.params["decoder"])
    with pytest.raises(ValueError, match="BEFORE quantize"):
        linear_to_lora_layers(fused, {"rank": 2, "keys": ["attn"]})


def test_effective_weight_preserves_base_dtype():
    """A bf16 model's fused weights must stay bf16: the f32 lora_scale
    would otherwise promote them, doubling decode-path HBM bytes."""
    model = CSM(tiny_args(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(5))
    linear_to_lora_layers(model, {"rank": 2, "scale": 2.0, "keys": ["attn"]})
    p = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    p["lora_b"] = jnp.ones_like(p["lora_b"])  # nonzero delta
    assert effective_weight(p).dtype == jnp.bfloat16
    fuse_lora(model)
    assert p["weight"].dtype == jnp.bfloat16


def test_fuse_lora_preserves_effective_weight():
    model = _lora_model(seed=4)
    p = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    p["lora_b"] = jnp.ones_like(p["lora_b"]) * 0.05
    want = np.asarray(effective_weight(p))
    fuse_lora(model)
    q = model.params["backbone"]["layers"][0]["self_attn"]["q_proj"]
    assert "lora_a" not in q
    np.testing.assert_allclose(np.asarray(q["weight"]), want, rtol=1e-6)


def test_dora_dropout_is_live_in_training_scope():
    """DoRA adapters must apply lora_dropout during training (mlx_lm
    DoRALinear semantics: dropout on the adapter branch, renormalization
    from the clean adapted weight) — it was silently inert before."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import tiny_args
    from csm_mlx_tpu.finetune.lora import linear_to_lora_layers
    from csm_mlx_tpu.models.csm import CSM
    from csm_mlx_tpu.ops.layers import linear, lora_dropout_rng

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    linear_to_lora_layers(
        model, config={"rank": 4, "scale": 20.0, "dropout": 0.5,
                       "keys": ["attn"]}, use_dora=True)
    lp = model.params["decoder"]["layers"][-1]["self_attn"]["q_proj"]
    assert "dora_m" in lp and "lora_dropout" in lp
    lp["lora_b"] = jax.random.normal(jax.random.PRNGKey(2),
                                     lp["lora_b"].shape) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (4, lp["weight"].shape[1]))
    y_eval = linear(lp, x)
    with lora_dropout_rng(jax.random.PRNGKey(4)):
        y_a = linear(lp, x)
    with lora_dropout_rng(jax.random.PRNGKey(5)):
        y_b = linear(lp, x)
    assert not np.allclose(np.asarray(y_a), np.asarray(y_eval))
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))
    # inference stays deterministic
    np.testing.assert_array_equal(np.asarray(linear(lp, x)),
                                  np.asarray(y_eval))
