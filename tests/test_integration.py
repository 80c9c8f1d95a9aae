"""End-to-end integration: text -> tokens -> fused generation -> Mimi decode
-> waveform, with a fake text tokenizer and a random-weight Mimi. Exercises
the full public `generate` / `stream_generate` paths offline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import csm_mlx_tpu.tokenizers as tok_mod
from conftest import tiny_args
from csm_mlx_tpu.models.csm import CSM


class FakeTextTokenizer:
    bos_token = "<b>"
    eos_token = "<e>"
    bos_token_id = 1
    eos_token_id = 2

    def encode(self, text: str):
        return [1] + [3 + (ord(c) % 50) for c in text[:10]] + [2]


@pytest.fixture()
def offline_tokenizers(monkeypatch):
    monkeypatch.setattr(tok_mod, "get_text_tokenizer",
                        lambda path=None: FakeTextTokenizer())
    tok_mod.get_audio_tokenizer.cache_clear()
    yield
    tok_mod.get_audio_tokenizer.cache_clear()


@pytest.fixture(scope="module")
def model():
    # n_audio_vocab must be <= mimi codebook size; tiny model uses 64 < 2048.
    return CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
               rng=jax.random.PRNGKey(0))


@pytest.mark.slow
def test_generate_end_to_end(offline_tokenizers, model):
    from csm_mlx_tpu.generation import generate

    audio = generate(model, "hello", speaker=0, context=[],
                     max_audio_length_ms=400, temperature=0.0)
    audio = np.asarray(audio)
    # 400ms cap -> up to 5 frames of 1920 samples each
    assert audio.ndim == 1
    assert audio.shape[0] % 1920 == 0
    assert 0 < audio.shape[0] <= 5 * 1920
    assert np.all(np.isfinite(audio))


@pytest.mark.slow
def test_stream_generate_matches_batch(offline_tokenizers, model):
    """Streaming chunks concatenated == batch decode of the same tokens."""
    from csm_mlx_tpu.generation import generate, stream_generate

    chunks = list(stream_generate(model, "hello", speaker=0, context=[],
                                  max_audio_length_ms=400, temperature=0.0,
                                  key=jax.random.PRNGKey(0)))
    assert chunks, "no chunks yielded"
    stream_audio = np.concatenate([np.asarray(c) for c in chunks])

    batch_audio = np.asarray(
        generate(model, "hello", speaker=0, context=[],
                 max_audio_length_ms=400, temperature=0.0,
                 key=jax.random.PRNGKey(0)))
    # Greedy decode => same tokens; batch vs streaming Mimi decode identical.
    assert stream_audio.shape == batch_audio.shape
    np.testing.assert_allclose(stream_audio, batch_audio, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_generate_with_context_segment(offline_tokenizers, model):
    """Context audio path: tokenize_audio (Mimi encode) feeds the prompt."""
    from csm_mlx_tpu.generation import generate
    from csm_mlx_tpu.segment import Segment

    ctx_audio = np.random.RandomState(0).randn(1920 * 2).astype(np.float32) * 0.1
    ctx = [Segment(speaker=1, text="prev turn", audio=ctx_audio)]
    audio = generate(model, "reply", speaker=0, context=ctx,
                     max_audio_length_ms=240, temperature=0.0)
    assert np.asarray(audio).ndim == 1


def test_generate_long_stitches_sentences(offline_tokenizers, model):
    """generate_long splits on sentence boundaries, carries a rolling
    context window, and concatenates — text length is no longer bound by
    the model context window."""
    from csm_mlx_tpu.generation import generate, generate_long

    text = "First sentence. Second one! Third thing?"
    long_audio = generate_long(model, text, speaker=0,
                               max_segment_audio_ms=240, temperature=0.0,
                               pause_ms=40)
    single = generate(model, "First sentence.", speaker=0,
                      max_audio_length_ms=240, temperature=0.0)
    assert long_audio.shape[0] > single.shape[0]  # 3 sentences + gaps
    # deterministic under greedy
    again = generate_long(model, text, speaker=0,
                          max_segment_audio_ms=240, temperature=0.0,
                          pause_ms=40)
    np.testing.assert_array_equal(np.asarray(long_audio), np.asarray(again))


def test_generate_long_empty_text(offline_tokenizers, model):
    from csm_mlx_tpu.generation import generate_long

    out = generate_long(model, "   ", speaker=0, temperature=0.0)
    assert out.shape == (0,)


def test_audio_tokenizer_explicit_missing_path_raises(tmp_path):
    """A typo'd explicit weights path must fail loudly — silently
    tokenizing a training set with a random-init codec is catastrophic."""
    import pytest as _pytest

    tok_mod.get_audio_tokenizer.cache_clear()
    with _pytest.raises(FileNotFoundError, match="Mimi weights"):
        tok_mod.get_audio_tokenizer(8, weights=str(tmp_path / "nope.st"))
    tok_mod.get_audio_tokenizer.cache_clear()


def test_audio_tokenizer_singleton_per_codebook_count():
    """Repeated no-weights calls share one codec instance (the cache is
    keyed on codebook count, not on the weights argument)."""
    tok_mod.get_audio_tokenizer.cache_clear()
    a = tok_mod.get_audio_tokenizer(8)
    b = tok_mod.get_audio_tokenizer(8)
    assert a is b
    tok_mod.get_audio_tokenizer.cache_clear()


def test_mimi_decode_step_explicit_state_is_reusable(offline_tokenizers):
    """Explicit-state decode_step must not consume (donate) the caller's
    state: branching two continuations from one prefix is legitimate."""
    mimi = tok_mod.get_audio_tokenizer(8)
    st = mimi.init_decode_state(1)
    codes = jnp.zeros((1, 8, 1), jnp.int32)
    a1, st1 = mimi.decode_step(codes, st)
    a2, _ = mimi.decode_step(codes, st)  # reuse st — must not raise
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_decoder_loss_fraction_requires_rng():
    import pytest as _pytest

    from csm_mlx_tpu.finetune.loss import compute_loss
    from csm_mlx_tpu.models.csm import CSM as _CSM

    m = _CSM(tiny_args(n_codebooks=8), dtype=jnp.float32,
             rng=jax.random.PRNGKey(0))
    k = m.args.n_audio_codebooks + 1
    batch = {
        "tokens": jnp.zeros((1, 4, k), jnp.int32),
        "masks": jnp.ones((1, 4, k), jnp.int32),
        "loss_masks": jnp.ones((1, 4, k), jnp.int32),
    }
    with _pytest.raises(ValueError, match="rng"):
        compute_loss(m.params, m.args, batch, decoder_loss_fraction=0.5)


def test_generate_long_wall_of_text_single_sentence(offline_tokenizers):
    """A single unpunctuated sentence longer than the token budget must be
    word-chunked, not crash with the context-window error."""
    import dataclasses

    import csm_mlx_tpu.config as config_mod
    from csm_mlx_tpu.generation import generate_long

    config_mod.BACKBONE_CONFIGURATION["tiny_narrow3"] = dataclasses.replace(
        config_mod.BACKBONE_CONFIGURATION["tiny"],
        max_position_embeddings=64)
    args = dataclasses.replace(tiny_args(n_codebooks=8),
                               backbone_name="tiny_narrow3")
    narrow = CSM(args, dtype=jnp.float32, rng=jax.random.PRNGKey(2))
    # no sentence-ending punctuation anywhere; far beyond the budget
    text = " ".join(f"word{i}" for i in range(120))
    out = generate_long(narrow, text, speaker=0, rolling_context=2,
                        max_segment_audio_ms=240, temperature=0.0)
    assert np.asarray(out).shape[0] > 0


def test_generate_long_spaceless_text(monkeypatch):
    """Space-less oversize text (CJK prose, URLs — no ASCII sentence enders,
    no spaces) must hard-split at character level, not crash generate() with
    the context-window error generate_long exists to avoid. Uses a
    NON-truncating fake tokenizer so encoded length really scales with
    text (the module FakeTextTokenizer caps at 10 chars)."""
    import dataclasses

    import csm_mlx_tpu.config as config_mod
    from csm_mlx_tpu.generation import generate_long

    class LongFakeTokenizer(FakeTextTokenizer):
        def encode(self, text: str):
            return [1] + [3 + (ord(c) % 50) for c in text] + [2]

    monkeypatch.setattr(tok_mod, "get_text_tokenizer",
                        lambda path=None: LongFakeTokenizer())
    tok_mod.get_audio_tokenizer.cache_clear()
    config_mod.BACKBONE_CONFIGURATION["tiny_narrow4"] = dataclasses.replace(
        config_mod.BACKBONE_CONFIGURATION["tiny"],
        max_position_embeddings=64)
    args = dataclasses.replace(tiny_args(n_codebooks=8),
                               backbone_name="tiny_narrow4")
    narrow = CSM(args, dtype=jnp.float32, rng=jax.random.PRNGKey(2))
    text = "字义语音" * 35  # 140 chars, no spaces/enders
    out = generate_long(narrow, text, speaker=0, rolling_context=1,
                        max_segment_audio_ms=240, temperature=0.0)
    assert np.asarray(out).shape[0] > 0
    tok_mod.get_audio_tokenizer.cache_clear()


def test_generate_batch_mismatched_lengths_raise(offline_tokenizers, model):
    from csm_mlx_tpu.generation import generate_batch

    with pytest.raises(ValueError, match="lengths differ"):
        generate_batch(model, ["a.", "b.", "c."], [0, 1],
                       max_audio_length_ms=240)


def test_repetition_context_beyond_history_ring_rejected():
    from csm_mlx_tpu.ops.sampling import HISTORY_SIZE, make_logits_processors

    make_logits_processors(repetition_penalty=1.3,
                           repetition_context_size=HISTORY_SIZE)  # ok
    with pytest.raises(ValueError, match="history ring"):
        make_logits_processors(repetition_penalty=1.3,
                               repetition_context_size=HISTORY_SIZE + 1)


def test_generate_long_rolling_context_zero(offline_tokenizers, model):
    """rolling_context=0 means independent sentences (ctx[-0:] must not
    mean 'keep everything'): the output equals the concatenation of solo
    greedy runs."""
    from csm_mlx_tpu.generation import generate, generate_long

    out = generate_long(model, "Alpha beta. Gamma delta.", speaker=0,
                        rolling_context=0, max_segment_audio_ms=240,
                        temperature=0.0)
    solos = [np.asarray(generate(model, s, speaker=0,
                                 max_audio_length_ms=240, temperature=0.0))
             for s in ("Alpha beta.", "Gamma delta.")]
    np.testing.assert_array_equal(np.asarray(out), np.concatenate(solos))


def test_generate_long_trims_context_to_window(offline_tokenizers):
    """The rolling context is trimmed by TOKEN budget against the backbone
    window, not just segment count — a narrow-window model must synthesize
    many sentences without ever hitting the 'Inputs too long' guard."""
    import dataclasses

    import csm_mlx_tpu.config as config_mod
    from csm_mlx_tpu.generation import generate_long

    config_mod.BACKBONE_CONFIGURATION["tiny_narrow"] = dataclasses.replace(
        config_mod.BACKBONE_CONFIGURATION["tiny"],
        max_position_embeddings=96)
    args = dataclasses.replace(tiny_args(n_codebooks=8),
                               backbone_name="tiny_narrow")
    narrow = CSM(args, dtype=jnp.float32, rng=jax.random.PRNGKey(1))
    text = " ".join(f"Sentence number {i} in the long text." for i in range(8))
    out = generate_long(narrow, text, speaker=0, rolling_context=50,
                        max_segment_audio_ms=240, temperature=0.0)
    assert np.asarray(out).shape[0] > 0


def test_generate_long_oversize_segment_budget_raises(offline_tokenizers, model):
    """A max_segment_audio_ms that alone exceeds the backbone context must
    raise a clear ValueError up front — it used to explode the text into
    single characters before failing with 'must be below <negative>'."""
    from csm_mlx_tpu.generation import generate_long

    ctx = model.args.backbone_config.max_position_embeddings or 2048
    with pytest.raises(ValueError, match="does not fit"):
        generate_long(model, "Hello there.", speaker=0,
                      max_segment_audio_ms=(ctx + 10) * 80)


def test_tokenize_audio_rejects_non_mono():
    """Stereo (T, 2) audio must raise, not be silently flattened into one
    interleaved double-speed waveform and encoded as garbage."""
    from csm_mlx_tpu.tokenizers import tokenize_audio

    stereo = np.zeros((1000, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="mono"):
        tokenize_audio(stereo, n_audio_codebooks=8)


def test_get_text_tokenizer_explicit_path_installs_canonical(monkeypatch):
    """An explicit startup path must install THE instance that later no-arg
    calls (tokenize_text_segment inside generate) share — otherwise the
    internal call re-resolves the default HF repo (offline crash or a
    silently different tokenizer)."""
    import csm_mlx_tpu.tokenizers as tok_mod

    calls = []

    class _Tok:
        bos_token = "<b>"; eos_token = "<e>"
        bos_token_id = 1; eos_token_id = 2

        def __init__(self):
            class _Inner:  # the post_processor assignment target
                post_processor = None
            self._tokenizer = _Inner()

    def fake_from_pretrained(src, **kw):
        calls.append(src)
        return _Tok()

    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(fake_from_pretrained))
    tok_mod.get_text_tokenizer.cache_clear()
    try:
        t1 = tok_mod.get_text_tokenizer("/some/local/tok")
        t2 = tok_mod.get_text_tokenizer()   # the internal no-arg call
        assert t2 is t1
        assert calls == ["/some/local/tok"]
    finally:
        tok_mod.get_text_tokenizer.cache_clear()
