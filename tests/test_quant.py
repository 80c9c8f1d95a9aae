"""Quantization tests: round-trip accuracy, matmul parity, model-level API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import tiny_args
from csm_mlx_tpu.ops.quant import (
    _xla_quant_matmul,
    dequantize_weight,
    quant_linear,
    quantize_model,
    quantize_weight,
)


def test_quantize_roundtrip_8bit():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    qp = quantize_weight(w, bits=8, group_size=64)
    assert qp["weight_q"].shape == (32, 128)
    assert qp["scales"].shape == (32, 2)
    back = dequantize_weight(qp, 8, 64, dtype=jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    # 8-bit affine per 64-group: error < half a step.
    step = np.asarray(qp["scales"]).max()
    assert err <= step * 0.51


def test_quantize_roundtrip_4bit_packing():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(16, 128).astype(np.float32))
    qp = quantize_weight(w, bits=4, group_size=64)
    # Native uint4 dtype: logical shape unchanged, XLA packs 2/byte in HBM.
    assert qp["weight_q"].shape == (16, 128)
    assert qp["weight_q"].dtype == jnp.uint4
    back = dequantize_weight(qp, 4, 64, dtype=jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w)).max()
    step = np.asarray(qp["scales"]).max()
    assert err <= step * 0.51


def test_quant_matmul_matches_dequant():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 128).astype(np.float32))
    for bits in (8, 4):
        qp = quantize_weight(w, bits=bits, group_size=64)
        wd = dequantize_weight(qp, bits, 64, dtype=jnp.float32)
        want = np.asarray(x @ wd.T)
        got = np.asarray(_xla_quant_matmul(x, qp, bits, 64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quant_linear_dispatch():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 128).astype(np.float32))
    qp = quantize_weight(w, bits=8, group_size=64)
    qp = dict(qp, _bits=8, _group_size=64)
    got = np.asarray(quant_linear(qp, x, use_pallas=False))
    wd = dequantize_weight(quantize_weight(w, 8, 64), 8, 64, jnp.float32)
    np.testing.assert_allclose(got, np.asarray(x @ wd.T), rtol=1e-4, atol=1e-4)


def test_quantize_model_and_generate():
    """Quantized tiny model still generates; output in valid token range."""
    from csm_mlx_tpu.generation import generate_tokens
    from csm_mlx_tpu.models.csm import CSM

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    quantize_model(model, bits=8, group_size=32, min_size=0)
    flat_keys = []

    def walk(t, p=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, f"{p}.{k}")
        elif isinstance(t, list):
            for i, v in enumerate(t):
                walk(v, f"{p}.{i}")
        else:
            flat_keys.append(p)

    walk(model.params)
    assert any(k.endswith("weight_q") for k in flat_keys)

    k = model.args.n_audio_codebooks + 1
    prompt = np.zeros((4, k), dtype=np.int32)
    prompt[:, -1] = np.arange(4)
    mask = np.zeros_like(prompt)
    mask[:, -1] = 1
    frames, n = generate_tokens(model, prompt, mask, 2, temperature=0.0)
    assert n >= 1
    assert frames.max() < model.args.n_audio_vocab


def test_w8a8_quantize_and_linear():
    """W8A8 per-channel path: XLA fallback correctness on CPU."""
    from csm_mlx_tpu.ops.quant import quantize_weight_w8

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 128).astype(np.float32))
    qp = quantize_weight_w8(w)
    assert qp["weight_q"].dtype == jnp.int8
    assert qp["scales"].shape == (64, 1)
    back = dequantize_weight(qp, 8, 128, dtype=jnp.float32)
    # per-channel int8: max error within one step
    step = np.asarray(qp["scales"]).max()
    assert np.abs(np.asarray(back) - np.asarray(w)).max() <= step * 0.51

    p = dict(qp, _bits=8, _group_size=128)
    got = np.asarray(quant_linear(p, x, use_pallas=False))
    want = np.asarray(x @ back.T)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_w8a8_large_batch_prefill_gate():
    """Quality gate for the large-batch W8A8 dispatch (ops/quant.py:431).

    B*S > 64 rows (the prefill / Mimi-codec-transformer regime) route
    through `_xla_w8a8_matvec` — dynamic int8 activation quant + int8 dot —
    instead of the full-precision dequant einsum, so quantized prefill
    numerics match the decode kernel's semantics instead of depending on
    the batch size. This gate bounds that routing's error against the
    dequant-einsum reference at a prefill-like shape."""
    from csm_mlx_tpu.ops.quant import quantize_weight_w8

    rng = np.random.RandomState(17)
    w = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(384, 256).astype(np.float32))  # B*S >> 64
    qp = quantize_weight_w8(w)
    p = dict(qp, _bits=8, _group_size=256)
    got = np.asarray(quant_linear(p, x, use_pallas=True))   # int8-dot mirror
    ref = np.asarray(quant_linear(p, x, use_pallas=False))  # dequant einsum
    # The two paths share the weight quantization; the delta is activation
    # int8 quantization only (~1% relative on N(0,1) rows).
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.02
    # and each row's error scales with that row's absmax (dynamic per-row
    # scales really are per-row, not one global scale)
    row_err = np.abs(got - ref).max(axis=1)
    assert np.median(row_err) / denom < 0.01


def test_w8a8_model_generate():
    from csm_mlx_tpu.generation import generate_tokens
    from csm_mlx_tpu.models.csm import CSM
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(8))
    quantize_model(model, mode="w8a8", min_size=0,
                   targets=("decoder", "projection"))
    k = model.args.n_audio_codebooks + 1
    prompt = np.zeros((4, k), dtype=np.int32)
    prompt[:, -1] = np.arange(4)
    mask = np.zeros_like(prompt)
    mask[:, -1] = 1
    frames, n = generate_tokens(model, prompt, mask, 2, temperature=0.0)
    assert n >= 1
    assert frames.max() < model.args.n_audio_vocab


def test_w4a8_cpu_path():
    """W4A8 per-channel int4 codes: CPU/XLA fallback correctness."""
    from csm_mlx_tpu.ops.quant import quantize_weight_w8

    rng = np.random.RandomState(6)
    w = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    qp = quantize_weight_w8(w, bits=4)
    assert qp["weight_q"].dtype == jnp.int4
    back = dequantize_weight(qp, 4, 128, dtype=jnp.float32)
    step = np.asarray(qp["scales"]).max()
    assert np.abs(np.asarray(back) - np.asarray(w)).max() <= step * 0.51

    x = jnp.asarray(rng.randn(1, 128).astype(np.float32))
    p = dict(qp, _bits=4, _group_size=128)
    got = np.asarray(quant_linear(p, x, use_pallas=False))
    np.testing.assert_allclose(got, np.asarray(x @ back.T), rtol=1e-4,
                               atol=1e-4)


def test_w8a8_pallas_kernel_interpret():
    """The W8A8 MXU kernel in Pallas interpret mode vs dequantized matmul."""
    from csm_mlx_tpu.ops.quant import (
        _pallas_quant_matvec_w8a8,
        quantize_weight_w8,
    )

    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(1, 256).astype(np.float32))
    qp = quantize_weight_w8(w)
    got = np.asarray(_pallas_quant_matvec_w8a8(
        x, qp["weight_q"], qp["scales"], qp["biases"], bits=8,
        group_size=256))
    back = dequantize_weight(qp, 8, 256, dtype=jnp.float32)
    want = np.asarray(x @ back.T)
    # activation int8 quantization adds ~1% relative error
    denom = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / denom < 0.02


def test_quantized_audio_head_matches_einsum():
    """quantize_audio_head + audio_head_logits vs the raw bf16 einsum path
    (pad slicing, per-head scales)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from csm_mlx_tpu.ops.quant import audio_head_logits, quantize_audio_head

    raw = jax.random.normal(jax.random.PRNGKey(9), (7, 32, 200))  # V=200: pads to 256
    qh = quantize_audio_head(raw)
    assert qh["weight_q"].shape == (7, 256, 32)
    h = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    for i in (0, 3, 6):
        a = np.asarray(audio_head_logits(raw, i, h, 200))
        b = np.asarray(audio_head_logits(qh, i, h, 200))
        assert a.shape == b.shape == (2, 200)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.02, rel


def test_codebook0_head_actually_quantized():
    """Regression: the _NO_QUANT 'codebook' guard must not swallow the
    codebook0_head Linear (it did when path started carrying the target
    key)."""
    import jax
    import jax.numpy as jnp

    from conftest import tiny_args
    from csm_mlx_tpu.models.csm import CSM
    from csm_mlx_tpu.ops.quant import quantize_model

    model = CSM(tiny_args(), dtype=jnp.float32, rng=jax.random.PRNGKey(0))
    quantize_model(model, mode="w8a8", min_size=1,
                   targets=("codebook0_head",))
    assert "weight_q" in model.params["codebook0_head"], \
        sorted(model.params["codebook0_head"].keys())


def test_w4a8_codes_safe_dtype_off_cpu():
    """quantize_weight_w8(bits=4) must not emit native int4 on backends
    where the runtime crashes on it (int8 carrier everywhere but CPU)."""
    import jax
    import jax.numpy as jnp

    from csm_mlx_tpu.ops.quant import quantize_weight_w8

    w = jnp.ones((128, 128), jnp.float32)
    qp = quantize_weight_w8(w, bits=4)
    if jax.default_backend() == "cpu":
        assert qp["weight_q"].dtype == jnp.int4
    else:
        assert qp["weight_q"].dtype == jnp.int8
