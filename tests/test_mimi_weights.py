"""Mimi checkpoint-mapping tests: moshi-naming path (fused qkv + rope
permutation) must produce the same params as the HF-naming path."""

import numpy as np
import jax.numpy as jnp
import pytest

from test_mimi import TINY
from csm_mlx_tpu.loaders import tree_to_flat
from csm_mlx_tpu.models.mimi.weights import (
    _permute_rope_rows,
    map_mimi_state_dict,
)


def _hf_state_dict():
    torch = pytest.importorskip("torch")
    from transformers import MimiModel
    from test_mimi import _hf_config

    torch.manual_seed(1)
    hf = MimiModel(_hf_config()).eval()
    return {k: v.numpy() for k, v in hf.state_dict().items()}


def _hf_to_moshi_names(state):
    """Re-serialize an HF state dict under moshi naming conventions."""
    out = {}
    d = TINY.hidden_size
    heads = TINY.num_attention_heads

    def unpermute(w):
        # inverse of the interleaved->half-split permutation
        out_dim, in_dim = w.shape
        hd = out_dim // heads
        return (w.reshape(heads, 2, hd // 2, in_dim)
                .transpose(0, 2, 1, 3).reshape(out_dim, in_dim))

    # collect q/k/v for fusion
    qkv = {}
    for name, v in state.items():
        if ".self_attn.q_proj.weight" in name or \
           ".self_attn.k_proj.weight" in name or \
           ".self_attn.v_proj.weight" in name:
            base = name.rsplit(".self_attn.", 1)[0]
            which = name.split(".self_attn.")[1][0]
            qkv.setdefault(base, {})[which] = v
            continue
        n = name
        n = n.replace("encoder.layers.", "encoder.model.")
        n = n.replace("decoder.layers.", "decoder.model.")
        if n.startswith(("encoder.model.", "decoder.model.", "downsample.",
                         "upsample.")):
            if "conv.weight" in n or "conv.bias" in n:
                # decoder transposed convs use convtr naming in moshi
                if n.startswith("decoder.model.") and ".block." not in n:
                    import re as _re

                    r = TINY.num_residual_layers
                    convtr_idx = {2 + (r + 2) * s
                                  for s in range(len(TINY.upsampling_ratios))}
                    m = _re.match(r"decoder\.model\.(\d+)\.conv\.(weight|bias)", n)
                    if m and int(m.group(1)) in convtr_idx:
                        n = n.replace(".conv.", ".convtr.convtr.")
                    else:
                        n = n.replace(".conv.", ".conv.conv.")
                elif n.startswith("upsample."):
                    n = n.replace(".conv.", ".convtr.convtr.")
                else:
                    n = n.replace(".conv.", ".conv.conv.")
        n = n.replace("_transformer.layers.", "_transformer.transformer.layers.")
        n = n.replace(".self_attn.o_proj.", ".self_attn.out_proj.")
        n = n.replace(".input_layernorm.", ".norm1.")
        n = n.replace(".post_attention_layernorm.", ".norm2.")
        n = n.replace(".mlp.fc1.", ".linear1.")
        n = n.replace(".mlp.fc2.", ".linear2.")
        n = n.replace(".self_attn_layer_scale.scale", ".layer_scale_1.scale")
        n = n.replace(".mlp_layer_scale.scale", ".layer_scale_2.scale")
        n = n.replace("semantic_residual_vector_quantizer", "rvq_first")
        n = n.replace("acoustic_residual_vector_quantizer", "rvq_rest")
        import re as _re

        n = _re.sub(r"(rvq_first|rvq_rest)\.layers\.(\d+)\.codebook\.",
                    r"\1.vq.layers.\2._codebook.", n)
        n = n.replace("._codebook.embed_sum", "._codebook.embedding_sum")
        out[n] = v

    for base, parts in qkv.items():
        moshi_base = base.replace("_transformer.layers.",
                                  "_transformer.transformer.layers.")
        fused = np.concatenate([unpermute(parts["q"]), unpermute(parts["k"]),
                                parts["v"]], axis=0)
        out[f"{moshi_base}.self_attn.in_proj_weight"] = fused
    return out


def test_permute_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 8).astype(np.float32)
    p = _permute_rope_rows(w, 2)
    # inverse
    hd = 8
    back = (p.reshape(2, 2, hd // 2, 8).transpose(0, 2, 1, 3).reshape(16, 8))
    np.testing.assert_array_equal(back, w)


def test_moshi_naming_matches_hf_naming():
    state_hf = _hf_state_dict()
    state_moshi = _hf_to_moshi_names(state_hf)

    tree_hf = map_mimi_state_dict(state_hf, TINY, dtype=jnp.float32)
    tree_moshi = map_mimi_state_dict(state_moshi, TINY, dtype=jnp.float32)

    flat_hf = tree_to_flat(tree_hf)
    flat_moshi = tree_to_flat(tree_moshi)
    assert set(flat_hf) == set(flat_moshi), (
        sorted(set(flat_hf) ^ set(flat_moshi))[:10])
    for k in flat_hf:
        np.testing.assert_allclose(
            np.asarray(flat_hf[k]), np.asarray(flat_moshi[k]),
            rtol=1e-6, err_msg=k)
