"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_mlx_tpu.config import LlamaConfig
from csm_mlx_tpu.models.llama import init_llama_params, llama_forward
from csm_mlx_tpu.ops.attention import causal_mask_bias
from csm_mlx_tpu.ops.rope import rope_cache_for
from csm_mlx_tpu.parallel import create_mesh
from csm_mlx_tpu.parallel.pipeline import (
    pipeline_forward,
    shard_pipeline_params,
    stack_pipeline_params,
)


def _cfg(n_layers=4):
    return LlamaConfig(
        vocab_size=64, num_hidden_layers=n_layers, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        hidden_size=64, max_position_embeddings=64,
    )


def _setup(n_layers=4, b=4, s=10, seed=0):
    cfg = _cfg(n_layers)
    params = init_llama_params(jax.random.PRNGKey(seed), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (b, s, cfg.hidden_size), jnp.float32)
    cos, sin = rope_cache_for(cfg, s)
    positions = jnp.arange(s)[None]
    bias = causal_mask_bias(s, s)[None, None]
    return cfg, params, x, cos, sin, positions, bias


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (4, 4)])
def test_pipeline_forward_matches_single_device(n_stages, n_micro):
    cfg, params, x, cos, sin, positions, bias = _setup()
    ref, _ = llama_forward(params, cfg, x, cos, sin, positions, bias, None)

    mesh = create_mesh({"pipe": n_stages},
                       devices=jax.devices()[:n_stages])
    stacked = shard_pipeline_params(
        stack_pipeline_params(params["layers"], n_stages), mesh)
    out = pipeline_forward(stacked, cfg, x, cos, sin, positions, bias,
                           mesh, n_micro, norm=params["norm"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pipeline_gradients_match_single_device():
    """Backward flows through scan+ppermute: grads wrt embeddings match."""
    cfg, params, x, cos, sin, positions, bias = _setup(b=4, s=6)
    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])
    stacked = shard_pipeline_params(
        stack_pipeline_params(params["layers"], 4), mesh)

    def ref_loss(xx):
        h, _ = llama_forward(params, cfg, xx, cos, sin, positions, bias, None)
        return jnp.sum(h ** 2)

    def pp_loss(xx):
        h = pipeline_forward(stacked, cfg, xx, cos, sin, positions, bias,
                             mesh, n_micro=2, norm=params["norm"], remat=True)
        return jnp.sum(h ** 2)

    g_ref = jax.grad(ref_loss)(x)
    g_pp = jax.jit(jax.grad(pp_loss))(x)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-4)


def test_pipeline_2d_pp_x_dp_matches_single_device():
    """2-D mesh: stages over "pipe", microbatch rows over "data"."""
    cfg, params, x, cos, sin, positions, bias = _setup(b=8, s=6)
    ref, _ = llama_forward(params, cfg, x, cos, sin, positions, bias, None)

    mesh = create_mesh({"pipe": 2, "data": 4})
    stacked = shard_pipeline_params(
        stack_pipeline_params(params["layers"], 2), mesh)
    out = pipeline_forward(stacked, cfg, x, cos, sin, positions, bias,
                           mesh, n_micro=2, norm=params["norm"],
                           data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    with pytest.raises(ValueError):  # microbatch 4 not divisible by 8
        pipeline_forward(stacked, cfg, x, cos, sin, positions, bias,
                         create_mesh({"pipe": 1, "data": 8}), n_micro=2,
                         data_axis="data")


def test_pipeline_weight_gradients_match_single_device():
    """Training path: grads wrt the stage-stacked weights match the
    single-device grads restacked the same way."""
    cfg, params, x, cos, sin, positions, bias = _setup(b=4, s=6)
    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])
    stacked = stack_pipeline_params(params["layers"], 4)

    def pp_loss(st):
        h = pipeline_forward(
            shard_pipeline_params(st, mesh), cfg, x, cos, sin, positions,
            bias, mesh, n_micro=2, norm=params["norm"], remat=True)
        return jnp.sum(h ** 2)

    def ref_loss(layers):
        h, _ = llama_forward({**params, "layers": layers}, cfg, x, cos,
                             sin, positions, bias, None)
        return jnp.sum(h ** 2)

    g_pp = jax.jit(jax.grad(pp_loss))(stacked)
    g_ref = stack_pipeline_params(jax.grad(ref_loss)(params["layers"]), 4)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_pipeline_per_batch_positions_and_mask():
    """Left-padded batches carry per-row positions and masks — they must
    travel WITH each microbatch through the pipe (stage s at tick t runs
    microbatch t-s), matching the single-device left-padded forward."""
    from csm_mlx_tpu.ops.attention import NEG_INF, key_validity_bias

    cfg, params, x, cos, sin, _, _ = _setup(b=4, s=6)
    pad = jnp.asarray([0, 2, 1, 3], jnp.int32)
    positions = jnp.arange(6)[None] - pad[:, None]          # (B, S)
    key_valid = jnp.arange(6)[None, :] >= pad[:, None]
    bias = jnp.maximum(  # (B, 1, S, S), as generation._prefill builds it
        causal_mask_bias(6, 6)[None, None]
        + key_validity_bias(key_valid)[:, None], NEG_INF)
    ref, _ = llama_forward(params, cfg, x, cos, sin, positions, bias, None)

    mesh = create_mesh({"pipe": 2}, devices=jax.devices()[:2])
    stacked = shard_pipeline_params(
        stack_pipeline_params(params["layers"], 2), mesh)
    out = pipeline_forward(stacked, cfg, x, cos, sin, positions, bias,
                           mesh, n_micro=2, norm=params["norm"])
    # Rows behind a left pad only matter at unpadded positions.
    for r in range(4):
        p = int(pad[r])
        np.testing.assert_allclose(np.asarray(out)[r, p:],
                                   np.asarray(ref)[r, p:],
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_fused_qkv_layout_matches_unfused():
    """Stages whose weights went through fuse_layer_weights (qkv_proj /
    gateup_proj) must produce the same hidden states."""
    from csm_mlx_tpu.models.llama import fuse_layer_weights

    cfg, params, x, cos, sin, positions, bias = _setup(b=2, s=6)
    mesh = create_mesh({"pipe": 2}, devices=jax.devices()[:2])
    ref, _ = llama_forward(params, cfg, x, cos, sin, positions, bias, None)

    import copy

    fused = copy.deepcopy({"layers": params["layers"]})
    fuse_layer_weights(fused)
    stacked = shard_pipeline_params(
        stack_pipeline_params(fused["layers"], 2), mesh)
    out = pipeline_forward(stacked, cfg, x, cos, sin, positions, bias,
                           mesh, n_micro=2, norm=params["norm"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_stack_pipeline_params_shapes():
    cfg, params, *_ = _setup(n_layers=4)
    stacked = stack_pipeline_params(params["layers"], 2)
    w = stacked["self_attn"]["q_proj"]["weight"]
    assert w.shape[:2] == (2, 2)
    np.testing.assert_array_equal(
        np.asarray(w[1, 0]),
        np.asarray(params["layers"][2]["self_attn"]["q_proj"]["weight"]))
    with pytest.raises(ValueError):
        stack_pipeline_params(params["layers"], 3)
