"""Mimi codec tests.

The strongest check here is golden parity against the *locally installed*
HF `transformers.MimiModel` (torch CPU) with randomly initialized weights
mapped through `map_mimi_state_dict` — an offline substitute for comparing
against the real `kyutai` checkpoint (SURVEY.md §4 golden-parity strategy).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csm_mlx_tpu.models.mimi import Mimi, MimiConfig, init_mimi_params
from csm_mlx_tpu.models.mimi.weights import map_mimi_state_dict

TINY = MimiConfig(
    sampling_rate=240,
    hidden_size=16,
    num_filters=4,
    num_residual_layers=1,
    upsampling_ratios=(4, 3),
    kernel_size=7,
    last_kernel_size=3,
    residual_kernel_size=3,
    codebook_size=32,
    codebook_dim=8,
    num_quantizers=4,
    num_semantic_quantizers=1,
    upsample_groups=16,
    num_hidden_layers=2,
    intermediate_size=32,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=8,
    sliding_window=6,
    frame_rate=10.0,  # encodec rate 240/12 = 20 -> stride-2 downsample
)


@pytest.fixture(scope="module")
def tiny_mimi() -> Mimi:
    return Mimi(TINY, rng=jax.random.PRNGKey(7))


def test_shapes_roundtrip(tiny_mimi):
    t = TINY.frame_size * 5
    audio = jnp.asarray(np.random.RandomState(0).randn(1, 1, t).astype(np.float32))
    codes = tiny_mimi.encode(audio)
    assert codes.shape == (1, TINY.num_quantizers, 5)
    assert int(codes.max()) < TINY.codebook_size and int(codes.min()) >= 0
    out = tiny_mimi.decode(codes)
    assert out.shape == (1, 1, t)


def test_decode_step_matches_batch(tiny_mimi):
    f = 6
    codes = jnp.asarray(
        np.random.RandomState(1).randint(0, TINY.codebook_size,
                                         size=(1, TINY.num_quantizers, f)),
        dtype=jnp.int32,
    )
    full = np.asarray(tiny_mimi.decode(codes))

    state = tiny_mimi.init_decode_state()
    chunks = []
    for i in range(f):
        chunk, state = tiny_mimi.decode_step(codes[:, :, i : i + 1], state)
        chunks.append(np.asarray(chunk))
    stream = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(full, stream, rtol=1e-4, atol=1e-5)


def test_decode_step_block_matches_per_frame(tiny_mimi):
    """F>1 block decode (the continuous engine's batched step-block path)
    must equal F sequential one-frame calls AND the batch decode — the
    streaming primitives are chunk-length generic; the ring needs
    chunk_frames slack (init_decode_state) to accept the wider write."""
    f, block = 8, 4
    codes = jnp.asarray(
        np.random.RandomState(3).randint(0, TINY.codebook_size,
                                         size=(2, TINY.num_quantizers, f)),
        dtype=jnp.int32,
    )
    full = np.asarray(tiny_mimi.decode(codes))

    state = tiny_mimi.init_decode_state(batch=2, chunk_frames=block)
    chunks = []
    for i in range(0, f, block):
        chunk, state = tiny_mimi.decode_step(codes[:, :, i:i + block], state)
        chunks.append(np.asarray(chunk))
    stream = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(full, stream, rtol=1e-4, atol=1e-5)

    # a block wider than the ring slack must fail loudly, not truncate
    small = tiny_mimi.init_decode_state(batch=2, chunk_frames=1)
    with pytest.raises(ValueError, match="ring slack"):
        tiny_mimi.decode_step(codes, small)


def test_encode_step_matches_batch(tiny_mimi):
    f = 6
    t = TINY.frame_size * f
    audio = jnp.asarray(np.random.RandomState(2).randn(1, 1, t).astype(np.float32))
    full = np.asarray(tiny_mimi.encode(audio))

    state = tiny_mimi.init_encode_state()
    codes = []
    fs = TINY.frame_size
    for i in range(f):
        c, state = tiny_mimi.encode_step(audio[:, :, i * fs : (i + 1) * fs], state)
        codes.append(np.asarray(c))
    stream = np.concatenate(codes, axis=-1)
    np.testing.assert_array_equal(full, stream)


def _hf_config():
    from transformers import MimiConfig as HFMimiConfig

    return HFMimiConfig(
        sampling_rate=TINY.sampling_rate,
        frame_rate=TINY.frame_rate,
        hidden_size=TINY.hidden_size,
        num_filters=TINY.num_filters,
        num_residual_layers=TINY.num_residual_layers,
        upsampling_ratios=list(TINY.upsampling_ratios),
        kernel_size=TINY.kernel_size,
        last_kernel_size=TINY.last_kernel_size,
        residual_kernel_size=TINY.residual_kernel_size,
        codebook_size=TINY.codebook_size,
        codebook_dim=TINY.codebook_dim,
        vector_quantization_hidden_dimension=TINY.codebook_dim,
        num_quantizers=TINY.num_quantizers,
        num_semantic_quantizers=TINY.num_semantic_quantizers,
        upsample_groups=TINY.upsample_groups,
        num_hidden_layers=TINY.num_hidden_layers,
        intermediate_size=TINY.intermediate_size,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        sliding_window=TINY.sliding_window,
        norm_eps=TINY.norm_eps,
        rope_theta=TINY.rope_theta,
        layer_scale_initial_scale=TINY.layer_scale_initial_scale,
    )


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import MimiModel

    torch.manual_seed(0)
    hf = MimiModel(_hf_config()).eval()
    # Randomize codebooks (init is zeros, which would make parity vacuous).
    with torch.no_grad():
        for q in (hf.quantizer.semantic_residual_vector_quantizer,
                  hf.quantizer.acoustic_residual_vector_quantizer):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)
                layer.codebook._embed = None
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = map_mimi_state_dict(state, TINY, dtype=jnp.float32)
    return hf, Mimi(TINY, params=params)


def test_hf_parity_decode(hf_pair):
    torch = pytest.importorskip("torch")
    hf, mine = hf_pair
    f = 7
    codes = np.random.RandomState(3).randint(
        0, TINY.codebook_size, size=(1, TINY.num_quantizers, f))
    with torch.no_grad():
        want = hf.decode(torch.tensor(codes))[0].numpy()
    got = np.asarray(mine.decode(jnp.asarray(codes)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_hf_parity_encode(hf_pair):
    torch = pytest.importorskip("torch")
    hf, mine = hf_pair
    t = TINY.frame_size * 6
    audio = np.random.RandomState(4).randn(1, 1, t).astype(np.float32)
    with torch.no_grad():
        want = hf.encode(torch.tensor(audio), num_quantizers=TINY.num_quantizers)[0].numpy()
    got = np.asarray(mine.encode(jnp.asarray(audio)))
    np.testing.assert_array_equal(got, want)


def test_decode_step_long_stream_beyond_window(tiny_mimi):
    """Streaming decode far past the transformer's sliding window must stay
    consistent with the batch decode (ring KV cache eviction correctness)."""
    f = TINY.sliding_window * 3 + 2  # 20 frames >> window 6
    codes = jnp.asarray(
        np.random.RandomState(9).randint(0, TINY.codebook_size,
                                         size=(1, TINY.num_quantizers, f)),
        dtype=jnp.int32,
    )
    full = np.asarray(tiny_mimi.decode(codes))
    state = tiny_mimi.init_decode_state()
    chunks = []
    for i in range(f):
        chunk, state = tiny_mimi.decode_step(codes[:, :, i : i + 1], state)
        chunks.append(np.asarray(chunk))
    stream = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(full, stream, rtol=1e-4, atol=1e-5)


def test_stateful_decode_step_and_reset(tiny_mimi):
    """Reference-style stateful interface: decode_step()/reset_state()."""
    codes = jnp.asarray(
        np.random.RandomState(10).randint(0, TINY.codebook_size,
                                          size=(1, TINY.num_quantizers, 1)),
        dtype=jnp.int32,
    )
    tiny_mimi.reset_state()
    a1 = np.asarray(tiny_mimi.decode_step(codes))
    a2 = np.asarray(tiny_mimi.decode_step(codes))
    assert a1.shape == a2.shape == (1, 1, TINY.frame_size)
    assert not np.allclose(a1, a2)  # stream state advanced
    tiny_mimi.reset_state()
    b1 = np.asarray(tiny_mimi.decode_step(codes))
    np.testing.assert_allclose(a1, b1, rtol=1e-5, atol=1e-6)

def test_encode_num_quantizers_validated(tiny_mimi):
    """num_quantizers=0 must raise, not silently fall back to the full
    codebook set (the old falsy-`or` default), and out-of-range must raise."""
    audio = jnp.zeros((1, 1, tiny_mimi.frame_size), jnp.float32)
    for bad in (0, -1, TINY.num_quantizers + 1):
        with pytest.raises(ValueError, match="num_quantizers"):
            tiny_mimi.encode(audio, num_quantizers=bad)
    # None still means "all" (shape checked in test_shapes_roundtrip).
    codes = tiny_mimi.encode(audio, num_quantizers=2)
    assert codes.shape[1] == 2
