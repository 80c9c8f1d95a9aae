"""W8A8 Mimi decode-path quantization (models/mimi/quant.py).

The quantized path keeps the exact decode graph (same convs, same
streaming state contracts) and adds ONLY quantization error: symmetric
per-out-channel int8 conv weights + per-row dynamic int8 activations, and
per-channel affine int8 transformer linears. Gates here bound that error
against the f32 decode on a tiny random codec and check the structural
contracts (encoder untouched, idempotence, streamed path runs the
quantized convs)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_mlx_tpu.models.mimi import Mimi
from csm_mlx_tpu.models.mimi.quant import (
    mimi_decoder_is_quantized,
    quantize_mimi_decoder,
)
from tests.test_mimi import TINY


@pytest.fixture()
def quant_pair():
    f32 = Mimi(TINY, rng=jax.random.PRNGKey(7))
    q = Mimi(TINY, params=jax.tree_util.tree_map(lambda a: a, f32.params),
             rng=jax.random.PRNGKey(7))
    quantize_mimi_decoder(q)
    return f32, q


def _rel_rmse(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / (np.sqrt(np.mean(a ** 2)) + 1e-12))


def test_quantized_decode_close_to_f32(quant_pair):
    f32, q = quant_pair
    codes = jnp.asarray(np.random.RandomState(0).randint(
        0, TINY.codebook_size, (2, TINY.num_quantizers, 6)), jnp.int32)
    a = f32.decode(codes)
    b = q.decode(codes)
    assert a.shape == b.shape
    rel = _rel_rmse(a, b)
    # int8 symmetric conv quant through ~10 layers on a random codec: a few
    # percent. An arithmetic bug (wrong scale axis, double bias, flipped
    # kernel) lands at O(1).
    assert rel < 0.12, rel


def test_quantized_streaming_matches_quantized_batch(quant_pair):
    """The streamed quantized decode re-quantizes activations per chunk, so
    it is NOT bit-equal to the quantized batch decode — but the carried
    conv states are exact f32 inputs, so the difference stays at the same
    order as the quantization noise itself."""
    _, q = quant_pair
    f = 6
    codes = jnp.asarray(np.random.RandomState(1).randint(
        0, TINY.codebook_size, (1, TINY.num_quantizers, f)), jnp.int32)
    full = q.decode(codes)
    state = q.init_decode_state(1)
    chunks = []
    for i in range(f):
        c, state = q.decode_step(codes[:, :, i:i + 1], state)
        chunks.append(np.asarray(c))
    stream = np.concatenate(chunks, axis=-1)
    assert _rel_rmse(full, stream) < 0.05


def test_encoder_untouched_and_idempotent(quant_pair):
    f32, q = quant_pair
    # encode path must remain the exact f32 graph (feeds training/parity)
    audio = jnp.asarray(np.random.RandomState(2).randn(
        1, 1, TINY.frame_size * 4).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(f32.encode(audio)),
                                  np.asarray(q.encode(audio)))
    assert "weight_q" not in q.params["encoder"]["init"]
    # rvq untouched: no weight_q anywhere under quantizer
    assert not any("weight_q" in str(p) for p in
                   jax.tree_util.tree_flatten_with_path(
                       q.params["quantizer"])[0] for p in [p[0]])
    assert mimi_decoder_is_quantized(q.params)
    before = jax.tree_util.tree_structure(q.params)
    quantize_mimi_decoder(q)  # second call: no-op
    assert jax.tree_util.tree_structure(q.params) == before


def test_grouped_upsample_stays_f32(quant_pair):
    _, q = quant_pair
    assert "weight_q" not in q.params["upsample"]
    # transformer linears did quantize
    lp = q.params["decoder_transformer"]["layers"][0]
    assert "weight_q" in lp["self_attn"]["q_proj"]
    assert "weight_q" in lp["mlp"]["fc1"]
    assert lp["self_attn"]["q_proj"]["weight_q"].dtype == jnp.int8


def test_quant_decode_state_contract_unchanged(quant_pair):
    """reset_decode_row and block decode still work on the quantized tree
    (the continuous engine recycles rows through both)."""
    from csm_mlx_tpu.models.mimi.mimi import (
        mimi_decode_step_fn,
        reset_decode_row,
    )

    _, q = quant_pair
    codes = jnp.asarray(np.random.RandomState(3).randint(
        0, TINY.codebook_size, (2, TINY.num_quantizers, 3)), jnp.int32)
    st = q.init_decode_state(2, chunk_frames=3)
    audio, st = mimi_decode_step_fn(q.params, TINY, codes, st)
    assert audio.shape == (2, 1, 3 * TINY.frame_size)
    st = reset_decode_row(st, 1)
    audio2, _ = mimi_decode_step_fn(q.params, TINY, codes, st)
    assert audio2.shape == audio.shape


def test_partial_targets():
    m = Mimi(TINY, rng=jax.random.PRNGKey(9))
    quantize_mimi_decoder(m, targets=("transformer",))
    assert "weight_q" not in m.params["decoder"]["init"]
    assert "weight_q" in m.params["decoder_transformer"]["layers"][0][
        "self_attn"]["q_proj"]
    m2 = Mimi(TINY, rng=jax.random.PRNGKey(9))
    quantize_mimi_decoder(m2, targets=("seanet",))
    assert "weight_q" in m2.params["decoder"]["init"]
    assert "weight_q" in m2.params["decoder"]["stages"][0]["up"]
    assert "weight_q" not in m2.params["decoder_transformer"]["layers"][0][
        "self_attn"]["q_proj"]
