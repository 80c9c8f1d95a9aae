"""Weight IO tests: flat<->tree mapping, save/load roundtrip, batch gen."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from conftest import tiny_args
from csm_mlx_tpu.loaders import flat_to_tree, tree_to_flat
from csm_mlx_tpu.models.csm import CSM


def test_flat_tree_roundtrip():
    flat = {
        "backbone.layers.0.self_attn.q_proj.weight": np.ones((2, 2)),
        "backbone.layers.1.mlp.gate_proj.weight": np.ones((3, 2)),
        "backbone.norm.weight": np.ones((2,)),
        "audio_head": np.ones((1, 2, 3)),
    }
    tree = flat_to_tree(flat)
    assert isinstance(tree["backbone"]["layers"], list)
    assert len(tree["backbone"]["layers"]) == 2
    back = tree_to_flat(tree)
    assert set(back) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(back[k], flat[k])


def test_save_load_roundtrip(tmp_path):
    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.safetensors")
    model.save_weights(path)

    fresh = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(99))
    fresh.load_weights(path)
    a = tree_to_flat(model.params)
    b = tree_to_flat(fresh.params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6)


def test_generate_tokens_batch(tiny_model):
    """Per-row EOS batch generation: rows are independent."""
    from csm_mlx_tpu.generation import generate_tokens_batch

    args = tiny_model.args
    k = args.n_audio_codebooks + 1
    rng = np.random.RandomState(0)
    prompts, masks = [], []
    for s in (3, 5):
        p = np.zeros((s, k), dtype=np.int32)
        p[:, -1] = rng.randint(0, 200, size=s)
        m = np.zeros_like(p)
        m[:, -1] = 1
        prompts.append(p)
        masks.append(m)
    frames, n = generate_tokens_batch(tiny_model, prompts, masks, 3,
                                      temperature=0.0)
    assert frames.shape == (3, 2, args.n_audio_codebooks)
    assert n.shape == (2,)
    assert (n >= 1).all()

    # Row 0 alone must reproduce the same tokens as in the batch (greedy,
    # same bucket): run single with the same bucket via batch of one.
    f1, n1 = generate_tokens_batch(tiny_model, [prompts[0]], [masks[0]], 3,
                                   temperature=0.0)
    # bucket differs only if lengths bucket differently; here both <= 32.
    np.testing.assert_array_equal(f1[: n1[0], 0], frames[: n[0], 0])

def test_nonstrict_load_evicts_superseded_representations(tmp_path):
    """A dense/unfused checkpoint loaded over a quantized+fused model must
    EVICT the stale weight_q/qkv_proj siblings: ops.layers.linear prefers
    weight_q and the attention layer prefers qkv_proj, so merely merging
    the new keys in would leave the fine-tune silently unserved."""
    import jax
    import jax.numpy as jnp

    from conftest import tiny_args
    from csm_mlx_tpu.loaders import save_csm_weights
    from csm_mlx_tpu.models.csm import CSM
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    fresh = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    quantize_model(model, mode="w8a8", min_size=1,
                   targets=("decoder", "projection"), fuse=True)
    dec0 = model.params["decoder"]["layers"][0]
    assert "qkv_proj" in dec0["self_attn"]
    assert "weight_q" in model.params["projection"]

    # dense, unfused checkpoint: projection + one decoder layer's q/k/v
    ckpt = {
        "projection": {"weight": fresh.params["projection"]["weight"]},
        "decoder": {"layers": [
            {"self_attn": {
                k: {"weight": fresh.params["decoder"]["layers"][0][
                    "self_attn"][k]["weight"]}
                for k in ("q_proj", "k_proj", "v_proj")
            }}
        ]},
    }
    path = str(tmp_path / "dense.safetensors")
    save_csm_weights(path, ckpt)
    model.load_weights(path, strict=False)

    proj = model.params["projection"]
    assert "weight" in proj and "weight_q" not in proj
    at = model.params["decoder"]["layers"][0]["self_attn"]
    assert "q_proj" in at and "qkv_proj" not in at
    np.testing.assert_array_equal(
        np.asarray(proj["weight"]),
        np.asarray(fresh.params["projection"]["weight"]))
    # untouched layers keep their quantized/fused form
    at1 = model.params["decoder"]["layers"][1]["self_attn"]
    assert "qkv_proj" in at1

def _quantized_fused_pair(tmp_path):
    import jax
    import jax.numpy as jnp

    from conftest import tiny_args
    from csm_mlx_tpu.models.csm import CSM
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    fresh = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    quantize_model(model, mode="w8a8", min_size=1,
                   targets=("decoder", "projection"), fuse=True)
    return model, fresh


def test_nonstrict_partial_proj_update_over_fused_fails_loud(tmp_path):
    """A checkpoint updating SOME of q/k/v (subset fine-tune, or an
    adapter-only dict) over a fused model must raise: the fused qkv_proj is
    the only copy of the other projections, so evicting it destroys them
    and keeping it silently ignores the update. Regression: this used to
    evict and crash the next forward with KeyError 'k_proj'."""
    import numpy as np

    from csm_mlx_tpu.loaders import save_csm_weights

    model, fresh = _quantized_fused_pair(tmp_path)
    q_new = fresh.params["decoder"]["layers"][0]["self_attn"]["q_proj"]["weight"]

    # subset fine-tune: q_proj base weight only
    p1 = str(tmp_path / "q_only.safetensors")
    save_csm_weights(p1, {"decoder": {"layers": [
        {"self_attn": {"q_proj": {"weight": q_new}}}]}})
    with pytest.raises(ValueError, match="fused"):
        model.load_weights(p1, strict=False)
    # the failed load must not have eaten the fused weights
    assert "qkv_proj" in model.params["decoder"]["layers"][0]["self_attn"]

    # adapter-only update: q_proj carrying lora factors, no base weight
    p2 = str(tmp_path / "lora_only.safetensors")
    save_csm_weights(p2, {"decoder": {"layers": [
        {"self_attn": {"q_proj": {
            "lora_a": np.zeros((4, q_new.shape[1]), np.float32),
            "lora_b": np.zeros((q_new.shape[0], 4), np.float32)}}}]}})
    with pytest.raises(ValueError, match="fused"):
        model.load_weights(p2, strict=False)


def test_nonstrict_load_preserves_quant_dtypes(tmp_path):
    """Quantized checkpoints round-trip with exact dtypes: int8 codes cast
    to the model float dtype would silently disable the W8A8 MXU kernel and
    the resident decoder (both dispatch on weight_q.dtype), and bf16-rounded
    scales would degrade every dequantized weight."""
    import jax
    import jax.numpy as jnp

    from conftest import tiny_args
    from csm_mlx_tpu.loaders import save_csm_weights
    from csm_mlx_tpu.models.csm import CSM

    model, _ = _quantized_fused_pair(tmp_path)
    path = str(tmp_path / "quant.safetensors")
    save_csm_weights(path, model.params)

    target = CSM(tiny_args(), dtype=jnp.bfloat16, rng=jax.random.PRNGKey(2))
    target.load_weights(path, strict=False)
    proj = target.params["projection"]
    assert proj["weight_q"].dtype == jnp.int8
    assert proj["scales"].dtype == jnp.float32
    # the dense (unquantized) weights did get cast to the model dtype
    # (o_proj stays unfused; q/k/v base copies are evicted in favor of the
    # checkpoint's fused qkv_proj, which is what actually serves)
    assert target.params["backbone"]["layers"][0]["self_attn"][
        "o_proj"]["weight"].dtype == jnp.bfloat16


def test_nonstrict_load_does_not_mutate_existing_tree(tmp_path):
    """load_weights(strict=False) must not write into / evict from the
    caller's pre-load params tree: a stashed rollback copy (or a second
    model sharing the tree) would silently mutate along."""
    from csm_mlx_tpu.loaders import save_csm_weights

    model, fresh = _quantized_fused_pair(tmp_path)
    before = model.params  # stashed reference, e.g. for rollback
    proj_before = before["projection"]
    assert "weight_q" in proj_before

    path = str(tmp_path / "dense.safetensors")
    save_csm_weights(
        path, {"projection": {"weight": fresh.params["projection"]["weight"]}})
    model.load_weights(path, strict=False)

    assert "weight" in model.params["projection"]
    assert "weight_q" not in model.params["projection"]
    # the stashed tree still holds the pre-load representation
    assert "weight_q" in proj_before
    assert "weight" not in proj_before


def test_resolve_weight_path_explicit_filename_missing_raises(tmp_path):
    """An explicitly requested filename that is absent must raise, not
    silently fall back to the default candidates (which would load the
    base model in place of the requested fine-tune)."""
    from csm_mlx_tpu.loaders import resolve_weight_path, save_csm_weights

    save_csm_weights(str(tmp_path / "mlx-ckpt.safetensors"),
                     {"x": np.zeros((2, 2), np.float32)})
    # default scan still works
    assert resolve_weight_path(str(tmp_path)).endswith("mlx-ckpt.safetensors")
    with pytest.raises(FileNotFoundError, match="nope"):
        resolve_weight_path(str(tmp_path), filename="nope.safetensors")


def test_nonstrict_fused_checkpoint_over_unfused_model(tmp_path):
    """Loading a fused/quantized checkpoint onto a plain model must (a) make
    the fused weights serve (the forward path prefers qkv_proj) and evict
    the now-dead unfused base weights, and (b) fail loudly when the model
    carries LoRA adapters on the unfused projections — the fused path would
    silently stop applying them."""
    import jax
    import jax.numpy as jnp

    from conftest import tiny_args
    from csm_mlx_tpu.finetune.lora import linear_to_lora_layers
    from csm_mlx_tpu.loaders import save_csm_weights
    from csm_mlx_tpu.models.csm import CSM

    fused_model, _ = _quantized_fused_pair(tmp_path)
    path = str(tmp_path / "fused.safetensors")
    save_csm_weights(path, fused_model.params)

    plain = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(3))
    plain.load_weights(path, strict=False)
    at = plain.params["decoder"]["layers"][0]["self_attn"]
    assert "qkv_proj" in at
    # stale unfused base weights are gone (they would never serve again)
    assert "q_proj" not in at or "weight" not in at["q_proj"]

    adapted = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(4))
    linear_to_lora_layers(adapted, {"rank": 4, "keys": ["attn"]})
    with pytest.raises(ValueError, match="adapters"):
        adapted.load_weights(path, strict=False)
