"""Golden parity of the Llama stack against the locally installed HF
`transformers.LlamaModel`.

The backbone/decoder formulas (llama3-scaled RoPE at
/root/reference/csm_mlx/attention.py:94-177, GQA, SwiGLU, RMSNorm) were
previously verified only against in-repo reimplementations — a shared
misreading would pass. This test maps a random HF Llama (half-split RoPE
convention) onto our pytree (pair-interleaved, torchtune convention) via the
per-head row permutation and requires the hidden states to match.

Permutation: HF rotates pairs (i, i+d/2); torchtune rotates (2i, 2i+1). Both
use angle theta_i, so reordering each head's q/k output rows as
[hf_0, hf_{d/2}, hf_1, hf_{d/2+1}, ...] makes the stacks identical (the same
trick models/mimi/weights.py uses for Mimi's codec transformer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csm_mlx_tpu.config import LlamaConfig, RopeScalingConfig
from csm_mlx_tpu.models.llama import llama_forward
from csm_mlx_tpu.ops.attention import causal_mask_bias
from csm_mlx_tpu.ops.kv_cache import KVCache
from csm_mlx_tpu.ops.rope import rope_cache_for

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

HIDDEN, HEADS, KV_HEADS, HEAD_DIM, FFN, LAYERS = 64, 4, 2, 16, 128, 2


def _hf_model(seed=0):
    from transformers.models.llama import LlamaConfig as HFConfig
    from transformers.models.llama import LlamaModel

    torch.manual_seed(seed)
    cfg = HFConfig(
        hidden_size=HIDDEN, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        intermediate_size=FFN, num_hidden_layers=LAYERS, vocab_size=256,
        rope_theta=500000.0, max_position_embeddings=16384,
        rms_norm_eps=1e-5, attention_bias=False, mlp_bias=False,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
    )
    model = LlamaModel(cfg).eval()
    return model


def _interleave_rows(w: np.ndarray, head_dim: int) -> np.ndarray:
    """Per-head row reorder: half-split (HF) -> pair-interleaved (ours)."""
    out_dim, in_dim = w.shape
    heads = out_dim // head_dim
    w = w.reshape(heads, 2, head_dim // 2, in_dim)
    return w.transpose(0, 2, 1, 3).reshape(out_dim, in_dim)


def _to_params(hf) -> dict:
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    layers = []
    for i in range(LAYERS):
        p = f"layers.{i}."
        layers.append({
            "self_attn": {
                "q_proj": {"weight": jnp.asarray(
                    _interleave_rows(sd[p + "self_attn.q_proj.weight"], HEAD_DIM))},
                "k_proj": {"weight": jnp.asarray(
                    _interleave_rows(sd[p + "self_attn.k_proj.weight"], HEAD_DIM))},
                "v_proj": {"weight": jnp.asarray(sd[p + "self_attn.v_proj.weight"])},
                "o_proj": {"weight": jnp.asarray(sd[p + "self_attn.o_proj.weight"])},
            },
            "mlp": {
                "gate_proj": {"weight": jnp.asarray(sd[p + "mlp.gate_proj.weight"])},
                "up_proj": {"weight": jnp.asarray(sd[p + "mlp.up_proj.weight"])},
                "down_proj": {"weight": jnp.asarray(sd[p + "mlp.down_proj.weight"])},
            },
            "input_layernorm": {"weight": jnp.asarray(sd[p + "input_layernorm.weight"])},
            "post_attention_layernorm": {"weight": jnp.asarray(
                sd[p + "post_attention_layernorm.weight"])},
        })
    return {"layers": layers, "norm": {"weight": jnp.asarray(sd["norm.weight"])}}


CFG = LlamaConfig(
    num_hidden_layers=LAYERS, num_attention_heads=HEADS,
    num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM, intermediate_size=FFN,
    hidden_size=HIDDEN, rope_theta=500000.0,
    rope_scaling=RopeScalingConfig(),  # llama3 factor 32, orig 8192
    max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def oracle():
    hf = _hf_model()
    return hf, _to_params(hf)


def test_prefill_hidden_parity(oracle):
    hf, params = oracle
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, HIDDEN).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()

    cos, sin = rope_cache_for(CFG, 32)
    got, _ = llama_forward(
        params, CFG, jnp.asarray(x), cos, sin, jnp.arange(7)[None],
        causal_mask_bias(7, 7)[None, None], None,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_long_position_rope_scaling_parity(oracle):
    """Positions past the llama3 low-frequency knee exercise the scaling."""
    hf, params = oracle
    rng = np.random.RandomState(1)
    s = 9
    x = rng.randn(1, s, HIDDEN).astype(np.float32) * 0.3
    start = 900  # deep enough that scaled vs unscaled frequencies diverge
    pos = torch.arange(start, start + s)[None]
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(x),
                  position_ids=pos).last_hidden_state.numpy()

    cos, sin = rope_cache_for(CFG, 1024)
    got, _ = llama_forward(
        params, CFG, jnp.asarray(x), cos, sin,
        jnp.arange(start, start + s)[None],
        causal_mask_bias(s, s)[None, None], None,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_decode_step_kv_cache_parity(oracle):
    """Prefill + single-token steps through our static KVCache must equal the
    HF full-sequence forward at every step position."""
    hf, params = oracle
    rng = np.random.RandomState(2)
    s_total, s_prefill = 10, 6
    x = rng.randn(1, s_total, HIDDEN).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()

    cap = 16
    cos, sin = rope_cache_for(CFG, 32)
    cache = KVCache.init(CFG, 1, cap, dtype=jnp.float32)
    k_idx = jnp.arange(cap)

    prefill_bias = jnp.where(
        (k_idx[None, :] <= jnp.arange(s_prefill)[:, None]), 0.0, -1e30
    ).astype(jnp.float32)[None, None]
    got_pre, cache = llama_forward(
        params, CFG, jnp.asarray(x[:, :s_prefill]), cos, sin,
        jnp.arange(s_prefill)[None], prefill_bias, cache,
    )
    np.testing.assert_allclose(np.asarray(got_pre), want[:, :s_prefill],
                               atol=2e-5, rtol=2e-5)

    for t in range(s_prefill, s_total):
        step_bias = jnp.where(k_idx <= t, 0.0, -1e30).astype(
            jnp.float32)[None, None, None, :]
        got_t, cache = llama_forward(
            params, CFG, jnp.asarray(x[:, t:t + 1]), cos, sin,
            jnp.asarray([[t]]), step_bias, cache,
        )
        np.testing.assert_allclose(
            np.asarray(got_t)[:, 0], want[:, t], atol=3e-5, rtol=3e-5,
            err_msg=f"step {t}",
        )


def test_fused_layout_matches_hf(oracle):
    """QKV/gate-up fusion must not change numerics vs the HF oracle."""
    import copy

    from csm_mlx_tpu.models.llama import fuse_layer_weights

    hf, params = oracle
    params = copy.deepcopy(params)
    fuse_layer_weights(params)
    assert "qkv_proj" in params["layers"][0]["self_attn"]
    rng = np.random.RandomState(3)
    x = rng.randn(1, 5, HIDDEN).astype(np.float32) * 0.3
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()
    cos, sin = rope_cache_for(CFG, 32)
    got, _ = llama_forward(
        params, CFG, jnp.asarray(x), cos, sin, jnp.arange(5)[None],
        causal_mask_bias(5, 5)[None, None], None,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
