"""Voice-chat pipeline tests with fake STT/LLM/TTS backends — validates the
orchestration semantics (worker wiring, sentence flow, context window,
barge-in fade, garbage filtering) without audio hardware or real models."""

import asyncio
import time

import numpy as np
import pytest

from csm_mlx_tpu.apps.stt import AsrSegment, OnlineASRProcessor
from csm_mlx_tpu.apps.voice_chat import (
    LLM_RESPONSE_END,
    MAX_CONTEXT_SEGMENTS,
    NullAudioIO,
    VoiceChatPipeline,
    echo_llm,
    is_likely_garbage,
    scrub_llm_text,
    split_sentences,
)


# ---------------------------------------------------------------------------
# Text hygiene
# ---------------------------------------------------------------------------


def test_split_sentences():
    assert split_sentences("Hello there. How are you? Good!") == [
        "Hello there.", "How are you?", "Good!"]
    assert split_sentences("No terminal punctuation") == [
        "No terminal punctuation"]
    assert split_sentences("") == []


def test_scrub_llm_text():
    assert scrub_llm_text("<|assistant|>Hi there</s>") == "Hi there"
    assert scrub_llm_text("[INST]x[/INST] ok") == "x ok"


def test_garbage_filter():
    assert is_likely_garbage("")
    assert is_likely_garbage("###$$$%%%^^^&&&")
    assert is_likely_garbage("a a a a a a a a a a a a")
    assert not is_likely_garbage("This is a perfectly normal sentence.")
    # digits are alnum, not garbage (reference counts isalnum)
    assert not is_likely_garbage("42.")
    assert not is_likely_garbage("It costs 1234 dollars.")


# ---------------------------------------------------------------------------
# OnlineASRProcessor with a fake backend
# ---------------------------------------------------------------------------


class FakeASR:
    """Transcribes 1 'word' per second of audio, deterministic."""

    def transcribe(self, audio, init_prompt=""):
        seconds = int(len(audio) / 16000)
        return [AsrSegment(i, i + 1, f"word{i}") for i in range(seconds)]


def test_online_asr_local_agreement_commits_and_trims():
    proc = OnlineASRProcessor(FakeASR())
    proc.insert_audio_chunk(np.zeros(16000 * 4, dtype=np.float32))
    # LocalAgreement-2: the first pass has nothing to agree with.
    assert proc.process_iter() == ""
    # Second pass over the same audio agrees on everything.
    text = proc.process_iter()
    assert "word0" in text and "word3" in text
    assert proc.buffer_time_offset > 0  # trimmed past the committed words
    final = proc.finish()
    assert isinstance(final, str)
    assert len(proc.audio_buffer) == 0


class ScriptedHypASR:
    """Returns a scripted sequence of word-level hypotheses."""

    def __init__(self, hyps):
        self.hyps = list(hyps)
        self.i = 0

    def transcribe(self, audio, init_prompt=""):
        from csm_mlx_tpu.apps.stt import AsrWord

        h = self.hyps[min(self.i, len(self.hyps) - 1)]
        self.i += 1
        return [AsrSegment(h[0][0], h[-1][1], " ".join(w for _, _, w in h),
                           words=[AsrWord(s, e, w) for s, e, w in h])]


def test_online_asr_never_commits_revised_words():
    """A word the next pass revises must not reach downstream (the weakness
    the round-1 commit policy had)."""
    h1 = [(0.0, 0.4, "hello"), (0.4, 0.8, "wold")]           # misheard
    h2 = [(0.0, 0.4, "hello"), (0.4, 0.8, "world"), (0.8, 1.2, "now")]
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h2, h2]))
    proc.insert_audio_chunk(np.zeros(16000 * 2, dtype=np.float32))
    assert proc.process_iter() == ""          # nothing agreed yet
    t2 = proc.process_iter()                   # h1 vs h2 agree only on "hello"
    assert t2 == "hello"
    assert "wold" not in t2
    t3 = proc.process_iter()                   # h2 vs h2: the revision lands
    assert t3 == "world now"
    all_text = " ".join(w for _, _, w in proc.committed)
    assert "wold" not in all_text


def test_online_asr_second_utterance_after_finish():
    """finish() must advance the time frontier so the next utterance's
    opening words are not swallowed by the committed-word filter."""
    proc = OnlineASRProcessor(FakeASR())
    proc.insert_audio_chunk(np.zeros(16000 * 4, dtype=np.float32))
    proc.process_iter()
    proc.process_iter()           # commits word0..word3
    proc.finish()
    # new utterance
    proc.insert_audio_chunk(np.zeros(16000 * 3, dtype=np.float32))
    assert proc.process_iter() == ""   # agreement priming
    text = proc.process_iter()
    assert "word0" in text, f"opening words lost: {text!r}"


def test_online_asr_jitter_does_not_recommit():
    """Small timestamp jitter on already-committed words must not re-commit
    them (midpoint-vs-frontier dedup)."""
    h1 = [(0.0, 1.0, "hello"), (1.0, 2.0, "world")]
    h2 = [(0.0, 1.05, "hello"), (1.05, 2.05, "world")]   # 50 ms drift
    h3 = [(0.0, 1.05, "hello"), (1.05, 2.05, "world"), (2.05, 3.0, "again")]
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h1, h2, h3, h3]))
    proc.insert_audio_chunk(np.zeros(16000 * 3, dtype=np.float32))
    texts = [proc.process_iter() for _ in range(5)]
    committed = [w for _, _, w in proc.committed]
    assert committed.count("world") == 1, committed
    assert committed.count("hello") == 1, committed
    assert "again" in committed


def test_online_asr_punctuation_token_does_not_stall():
    """A punctuation-only token must not block agreement behind it."""
    h = [(0.0, 0.4, "hello"), (0.4, 0.5, "..."), (0.5, 0.9, "world")]
    proc = OnlineASRProcessor(ScriptedHypASR([h, h]))
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    proc.process_iter()
    text = proc.process_iter()
    assert "world" in text, text


def test_online_asr_leading_punctuation_does_not_shift_alignment():
    """A punctuation token appearing at the head of the new hypothesis must
    consume only its own position: pairing it against a previous *word*
    would misalign the LocalAgreement comparison and commit unagreed text."""
    h1 = [(0.0, 0.4, "hello"), (0.4, 0.8, "world")]
    h2 = [(0.0, 0.1, ","), (0.1, 0.4, "hello"), (0.4, 0.8, "world")]
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h2]))
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    proc.process_iter()
    text = proc.process_iter()
    # 'hello world' agreed across both hypotheses; alignment not shifted
    assert "hello" in text and "world" in text, text


def test_online_asr_stray_leading_punctuation_never_commits():
    """A punctuation-only token with NO previous hypothesis covering it
    must not commit: it would advance the committed frontier past real
    audio and permanently swallow the utterance's opening words."""

    class PunctFirstASR:
        def __init__(self):
            self.calls = 0

        def transcribe(self, audio, init_prompt=""):
            self.calls += 1
            if self.calls == 1:  # noise pass: just a stray '.'
                return [AsrSegment(2.9, 3.1, ".")]
            seconds = int(len(audio) / 16000)
            return [AsrSegment(i, i + 1, f"word{i}") for i in range(seconds)]

    proc = OnlineASRProcessor(PunctFirstASR(), min_chunk_seconds=0.0)
    proc.insert_audio_chunk(np.zeros(16000 * 4, dtype=np.float32))
    assert proc.process_iter() == ""      # stray '.' not committed
    assert proc.committed == []
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    text = proc.process_iter()
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    text += " " + proc.process_iter()
    assert "word0" in text                # opening words survive


def test_online_asr_prompt_only_from_scrolled_out_text():
    """The transcription prompt must contain only committed text whose
    audio LEFT the buffer — priming whisper with words it is about to
    re-hear makes it skip the buffer-initial region."""
    proc = OnlineASRProcessor(FakeASR(), min_chunk_seconds=0.0)
    proc.insert_audio_chunk(np.zeros(16000 * 3, dtype=np.float32))
    proc.process_iter()
    proc.insert_audio_chunk(np.zeros(16000 * 2, dtype=np.float32))
    proc.process_iter()  # agreement commits some words
    assert proc.committed, "setup: nothing committed"
    # every prompted word's audio must be outside the current buffer
    for (_s, e, w) in proc.committed[:proc._prompted_upto]:
        assert e <= proc.buffer_time_offset
    for (_s, e, w) in proc.committed[proc._prompted_upto:]:
        assert w.strip() not in proc.prompt_text.split() or \
            e <= proc.buffer_time_offset


def test_online_asr_min_chunk_gating():
    proc = OnlineASRProcessor(FakeASR(), min_chunk_seconds=1.0)
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    assert proc.process_iter() == ""   # first pass: primes agreement
    assert proc.process_iter() == ""   # gated: no new audio since last pass
    proc.insert_audio_chunk(np.zeros(16000 * 2, dtype=np.float32))
    text = proc.process_iter()         # enough new audio: agreement commits
    assert "word0" in text


# ---------------------------------------------------------------------------
# Full pipeline with fakes
# ---------------------------------------------------------------------------


class ScriptedSTT:
    """Emits a scripted utterance once enough audio arrives."""

    def __init__(self, utterance="hello pipeline."):
        self.utterance = utterance
        self.total = 0
        self.emitted = False

    def insert_audio_chunk(self, chunk):
        self.total += len(chunk)

    def process_iter(self):
        if not self.emitted and self.total >= 16000:
            self.emitted = True
            return self.utterance
        return ""

    def finish(self):
        return ""


def fake_tts_stream(text, speaker, context):
    for _ in range(3):
        yield np.ones(1920, dtype=np.float32) * 0.1


def test_pipeline_end_to_end():
    stt = ScriptedSTT("hi there.")
    audio_io = NullAudioIO()
    pipe = VoiceChatPipeline(stt, echo_llm, fake_tts_stream, audio_io)

    async def scenario():
        run = asyncio.create_task(pipe.run_async(duration=3.0))
        await asyncio.sleep(0.2)
        # speech: loud chunks
        for _ in range(8):
            audio_io.feed(np.ones(4000, dtype=np.float32) * 0.2)
            await asyncio.sleep(0.02)
        await run

    asyncio.run(scenario())
    # LLM echoed, TTS spoke -> chunks played and a context segment appended
    assert len(audio_io.played) >= 3
    assert len(pipe.state.context_segments) >= 1
    assert pipe.state.messages[-1]["role"] == "assistant"
    assert "hi there." in pipe.state.messages[0]["content"]


def test_utterance_flushes_when_audio_source_stops():
    """An utterance whose source simply STOPS sending chunks (batch feeds,
    a paused mic) must still commit via stt.finish(): the queue-timeout
    path accumulates silence too."""

    class FinishOnlySTT(ScriptedSTT):
        def __init__(self):
            super().__init__()
            self.finished = False

        def process_iter(self):
            return ""  # nothing commits incrementally

        def finish(self):
            self.finished = True
            return "spoken at the end."

    stt = FinishOnlySTT()
    audio_io = NullAudioIO()
    pipe = VoiceChatPipeline(stt, echo_llm, fake_tts_stream, audio_io)

    async def scenario():
        run = asyncio.create_task(pipe.run_async(duration=3.0))
        await asyncio.sleep(0.2)
        for _ in range(4):  # loud speech, then the source goes quiet
            audio_io.feed(np.ones(4000, dtype=np.float32) * 0.2)
            await asyncio.sleep(0.02)
        await run

    asyncio.run(scenario())
    assert stt.finished, "finish() never ran after the source stopped"
    assert any(m["role"] == "user" and "spoken at the end." in m["content"]
               for m in pipe.state.messages)


def test_context_window_rolls():
    stt = ScriptedSTT()
    pipe = VoiceChatPipeline(stt, echo_llm, fake_tts_stream, NullAudioIO())
    from csm_mlx_tpu.segment import Segment

    for i in range(10):
        pipe.state.context_segments.append(
            Segment(0, f"s{i}", np.zeros(10, dtype=np.float32)))
        del pipe.state.context_segments[:-MAX_CONTEXT_SEGMENTS]
    assert len(pipe.state.context_segments) == MAX_CONTEXT_SEGMENTS
    assert pipe.state.context_segments[0].text == "s4"


def test_streaming_llm_sentences_emitted_incrementally():
    """The llm worker must push each completed sentence to TTS while the
    token iterator is still producing (reference streams tokens,
    run_streaming_csm_mlx.py:577-647; we stream the sentences out too)."""
    from concurrent.futures import ThreadPoolExecutor

    from csm_mlx_tpu.apps.voice_chat import (ConversationState,
                                             _stream_llm_reply)

    state = ConversationState()
    seen_at_third_chunk = []

    def chunks():
        yield "Hello wor"
        yield "ld. This is"
        seen_at_third_chunk.append(state.llm_out_q.qsize())
        yield " more. <|eot_id|> trailing junk"

    async def scenario():
        loop = asyncio.get_running_loop()
        with ThreadPoolExecutor(2) as ex:
            return await _stream_llm_reply(state, chunks(), loop, ex)

    emitted = asyncio.run(scenario())
    assert emitted == ["Hello world.", "This is more."]
    # first sentence was already queued before the third chunk was pulled
    assert seen_at_third_chunk == [1]
    # nothing after the end token leaked
    q = []
    while not state.llm_out_q.empty():
        q.append(state.llm_out_q.get_nowait())
    assert q == ["Hello world.", "This is more."]


def test_streaming_llm_role_marker_truncates():
    from concurrent.futures import ThreadPoolExecutor

    from csm_mlx_tpu.apps.voice_chat import (ConversationState,
                                             _stream_llm_reply)

    state = ConversationState()

    def chunks():
        yield "Sure thing. user|> pretend user turn."

    async def scenario():
        loop = asyncio.get_running_loop()
        with ThreadPoolExecutor(2) as ex:
            return await _stream_llm_reply(state, chunks(), loop, ex)

    emitted = asyncio.run(scenario())
    assert emitted == ["Sure thing."]


def test_blocking_llm_backend_still_works():
    """Plain messages->str backends remain supported."""
    from concurrent.futures import ThreadPoolExecutor

    from csm_mlx_tpu.apps.voice_chat import (ConversationState,
                                             _stream_llm_reply)

    state = ConversationState()

    async def scenario():
        loop = asyncio.get_running_loop()
        with ThreadPoolExecutor(2) as ex:
            return await _stream_llm_reply(
                state, "<|assistant|>One. Two!</s>", loop, ex)

    emitted = asyncio.run(scenario())
    assert emitted == ["One.", "Two!"]


def _tiny_hf_llm():
    """A real (tiny, deterministic) transformers causal LM + tokenizer,
    built offline: zero lm_head => greedy always picks token 0, whose vocab
    entry is a full sentence."""
    pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import LlamaConfig, LlamaForCausalLM, \
        PreTrainedTokenizerFast
    import torch

    sentence = "Nice to meet you friend."
    vocab = {sentence: 0, "<unk>": 1, "</s>": 2, "<pad>": 3}
    for i, w in enumerate(["hello", "there", "user", "assistant", ":"],
                          start=4):
        vocab[w] = i
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    hf_tok = PreTrainedTokenizerFast(tokenizer_object=tok,
                                     unk_token="<unk>", eos_token="</s>",
                                     pad_token="<pad>")
    cfg = LlamaConfig(vocab_size=len(vocab), hidden_size=32,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, intermediate_size=64,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        model.lm_head.weight.zero_()  # all logits equal -> greedy picks id 0
    return model, hf_tok, sentence


def test_e2e_real_tiny_lm_drives_stt_llm_tts():
    """STT -> (real transformers LM, streaming) -> TTS with fakes only at
    the audio edges; the session audio dumps to a wav."""
    import tempfile, os

    from csm_mlx_tpu.apps.voice_chat import TransformersLLM

    model, tok, sentence = _tiny_hf_llm()
    llm = TransformersLLM(model, tok, max_tokens=1, temperature=0.0)

    stt = ScriptedSTT("hello there.")
    audio_io = NullAudioIO()
    with tempfile.TemporaryDirectory() as td:
        wav_path = os.path.join(td, "session.wav")
        pipe = VoiceChatPipeline(stt, llm, fake_tts_stream, audio_io,
                                 output_file=wav_path)

        async def scenario():
            run = asyncio.create_task(pipe.run_async(duration=4.0))
            await asyncio.sleep(0.2)
            for _ in range(8):
                audio_io.feed(np.ones(4000, dtype=np.float32) * 0.2)
                await asyncio.sleep(0.02)
            await run

        asyncio.run(scenario())
        assert pipe.state.messages[0]["content"] == "hello there."
        assert pipe.state.messages[-1]["role"] == "assistant"
        assert sentence in pipe.state.messages[-1]["content"]
        assert len(audio_io.played) >= 3           # TTS spoke
        assert os.path.exists(wav_path)            # session audio dumped
        from csm_mlx_tpu.utils.audio import read_audio

        wav = read_audio(wav_path, 24000)
        assert len(wav) >= 3 * 1920


def test_barge_in_fades_and_flushes():
    """Interruption mid-TTS ramps gain down and drops queued sentences."""
    stt = ScriptedSTT()
    audio_io = NullAudioIO()

    def long_tts(text, speaker, context):
        for _ in range(200):
            time.sleep(0.01)  # slow generator so the barge-in lands mid-TTS
            yield np.ones(1920, dtype=np.float32)

    pipe = VoiceChatPipeline(stt, echo_llm, long_tts, audio_io)

    async def scenario():
        run = asyncio.create_task(pipe.run_async(duration=2.5))
        state = pipe.state
        await state.llm_out_q.put("first sentence.")
        await state.llm_out_q.put("queued sentence.")
        await state.llm_out_q.put(LLM_RESPONSE_END)
        # wait (bounded) for TTS to start, then barge in
        deadline = time.monotonic() + 2.0
        while not state.tts_speaking and time.monotonic() < deadline:
            await asyncio.sleep(0.01)
        assert state.tts_speaking, "TTS never started"
        await asyncio.sleep(0.1)
        state.interruption.set()
        await run

    asyncio.run(scenario())
    # Fade: the last played chunks are attenuated versions of 1.0
    assert audio_io.played, "TTS produced audio"
    last = audio_io.played[-1]
    assert last.max() < 1.0
    # queued sentence flushed
    assert pipe.state.llm_out_q.empty()
    # buffered DEVICE audio dropped too — barge-in must actually silence
    # the speaker, not only stop feeding it
    assert audio_io.flushes >= 1


def test_barge_in_discards_straggler_sentences():
    """Sentences of the interrupted response that the LLM emits *after* the
    flush must also be dropped (until its LLM_RESPONSE_END arrives)."""
    stt = ScriptedSTT()
    audio_io = NullAudioIO()
    spoken = []

    def tts(text, speaker, context):
        spoken.append(text)
        for _ in range(40):
            time.sleep(0.01)
            yield np.ones(1920, dtype=np.float32)

    pipe = VoiceChatPipeline(stt, echo_llm, tts, audio_io)

    async def scenario():
        run = asyncio.create_task(pipe.run_async(duration=2.5))
        state = pipe.state
        await state.llm_out_q.put("first sentence.")
        deadline = time.monotonic() + 2.0
        while not state.tts_speaking and time.monotonic() < deadline:
            await asyncio.sleep(0.01)
        assert state.tts_speaking, "TTS never started"
        state.interruption.set()
        # straggler of the SAME response arrives after the flush ran
        await asyncio.sleep(0.6)
        await state.llm_out_q.put("straggler sentence.")
        await state.llm_out_q.put(LLM_RESPONSE_END)
        # a fresh response after END must be spoken again
        await state.llm_out_q.put("next response.")
        await state.llm_out_q.put(LLM_RESPONSE_END)
        await run

    asyncio.run(scenario())
    assert "straggler sentence." not in spoken, spoken
    assert "next response." in spoken, spoken

def test_streaming_llm_leading_eot_stops_empty_turn():
    """A reply that BEGINS with the stop token is an empty turn: the header
    scrubber must not delete it as scaffolding and speak run-past text."""
    from concurrent.futures import ThreadPoolExecutor

    from csm_mlx_tpu.apps.voice_chat import (ConversationState,
                                             _stream_llm_reply)

    state = ConversationState()

    def chunks():
        yield "<|eot_id|>"
        yield " Hallucinated next turn that must never be spoken."

    async def scenario():
        loop = asyncio.get_running_loop()
        with ThreadPoolExecutor(2) as ex:
            return await _stream_llm_reply(state, chunks(), loop, ex)

    emitted = asyncio.run(scenario())
    assert emitted == []
    assert state.llm_out_q.empty()


def test_online_asr_punct_disagreement_does_not_commit():
    """A punctuation-only token must not commit while the neighboring real
    words still DISAGREE: its (multi-second) timestamp would advance the
    committed frontier over unconfirmed audio and swallow the opening
    words."""
    h1 = [(0.0, 0.4, "hello")]
    h2 = [(0.0, 2.0, ","), (2.0, 2.4, "goodbye")]
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h2, h2]))
    proc.insert_audio_chunk(np.zeros(16000 * 3, dtype=np.float32))
    assert proc.process_iter() == ""          # h1: priming
    assert proc.process_iter() == ""          # h1 vs h2 disagree: NOTHING
    t3 = proc.process_iter()                   # h2 vs h2: now committed
    assert "goodbye" in t3


def test_vad_stt_idle_mic_buffer_bounded():
    """Hours of silent mic must not feed the STT buffer (it would grow
    without bound); only a ~1 s pre-roll is replayed at speech onset so
    the utterance keeps its leading context."""
    from csm_mlx_tpu.apps.voice_chat import vad_stt_worker, ConversationState
    from concurrent.futures import ThreadPoolExecutor

    stt = ScriptedSTT("late hello.")
    state = ConversationState()

    async def scenario():
        with ThreadPoolExecutor(2) as ex:
            task = asyncio.create_task(vad_stt_worker(state, stt, ex))
            # 60 blocks (~3 s worth) of pure silence
            for _ in range(60):
                state.audio_in_q.put_nowait(np.zeros(800, dtype=np.float32))
            await asyncio.sleep(0.3)
            silent_total = stt.total
            # speech onset: pre-roll (~<=1 s) + the loud chunks arrive
            for _ in range(25):
                state.audio_in_q.put_nowait(
                    np.ones(800, dtype=np.float32) * 0.2)
            await asyncio.sleep(0.3)
            state.shutdown.set()
            await task
            return silent_total

    silent_total = asyncio.run(scenario())
    assert silent_total == 0, "silent chunks reached the STT buffer"
    # pre-roll (<= 1 s = 16000) + 25 loud chunks (20000)
    assert 20000 <= stt.total <= 16000 + 25 * 800
    assert stt.emitted  # speech still transcribed after the long silence


def test_tts_timeout_does_not_starve_the_next_sentence(monkeypatch):
    """A wedged generation (the TTS_TIMEOUT_S case) parks its thread
    forever; the worker must replace its generation pool so the NEXT
    sentence still speaks instead of the whole pipeline freezing."""
    import threading

    import csm_mlx_tpu.apps.voice_chat as vc

    monkeypatch.setattr(vc, "TTS_TIMEOUT_S", 0.4)
    unwedge = threading.Event()
    calls = []

    def tts_stream(text, speaker, context):
        calls.append(text)
        if len(calls) == 1:
            unwedge.wait()  # wedged device call; released at teardown
            return
            yield  # pragma: no cover — makes this a generator
        for _ in range(3):
            yield np.ones(1920, dtype=np.float32) * 0.1

    audio_io = NullAudioIO()
    state = vc.ConversationState()

    async def scenario():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            task = asyncio.create_task(
                vc.tts_worker(state, tts_stream, audio_io, ex))
            await state.llm_out_q.put("first sentence wedges.")
            await state.llm_out_q.put("second sentence speaks.")
            await state.llm_out_q.put(LLM_RESPONSE_END)
            for _ in range(100):
                if len(audio_io.played) >= 3:
                    break
                await asyncio.sleep(0.1)
            state.shutdown.set()
            await task

    try:
        asyncio.run(scenario())
    finally:
        unwedge.set()  # release the parked thread so pytest can exit
    assert calls == ["first sentence wedges.", "second sentence speaks."]
    assert len(audio_io.played) >= 3, "second sentence never played"

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_online_asr_fuzz_unstable_tail_never_commits(seed):
    """Randomized LocalAgreement stress: the hypothesis tail is corrupted
    differently on every pass (whisper-style instability). Committed text
    must (a) never contain a corrupted word, (b) never revise — each
    process_iter only APPENDS, and (c) end up exactly the ground-truth
    word sequence once the tail stabilizes."""
    from csm_mlx_tpu.apps.stt import AsrWord

    rng = np.random.RandomState(200 + seed)
    RATE = 16000
    WORD_S = 0.4
    truth = [f"word{i}" for i in range(14)]
    corrupt = {"on": True}
    passes = {"n": 0}

    class UnstableASR:
        def transcribe(self, audio, init_prompt=""):
            passes["n"] += 1
            offset = proc.buffer_time_offset
            span = len(audio) / RATE
            words = []
            for i, w in enumerate(truth):
                s, e = i * WORD_S, (i + 1) * WORD_S
                if s >= offset - 1e-6 and e <= offset + span + 1e-6:
                    words.append([s - offset, e - offset, w])
            if corrupt["on"] and words:
                # corrupt the last 0-2 visible words, uniquely per pass so
                # no two consecutive hypotheses ever agree on a bad word
                for j in range(int(rng.randint(0, 3))):
                    if j < len(words):
                        words[-1 - j][2] = f"bad{passes['n']}_{j}"
            if not words:
                return []
            return [AsrSegment(words[0][0], words[-1][1],
                               " ".join(w for _, _, w in words),
                               words=[AsrWord(s, e, w) for s, e, w in words])]

    proc = OnlineASRProcessor(UnstableASR(), buffer_trimming_sec=3.0)
    committed_stream = []
    for i in range(len(truth)):
        proc.insert_audio_chunk(np.zeros(int(RATE * WORD_S), np.float32))
        out = proc.process_iter()
        if out:
            committed_stream.extend(out.split())
    corrupt["on"] = False  # tail stabilizes
    for _ in range(3):
        out = proc.process_iter()
        if out:
            committed_stream.extend(out.split())
    final = proc.finish()
    if final:
        committed_stream.extend(final.split())

    assert not any(w.startswith("bad") for w in committed_stream), \
        committed_stream
    assert committed_stream == truth, committed_stream
    # the committed record itself is append-only ground truth too
    record = [w for _, _, w in proc.committed]
    assert record == truth

def test_online_asr_interior_punct_disagreement_does_not_commit():
    """Punctuation AFTER an agreed word must still wait for the next real
    word to agree: a multi-second ',' committed eagerly would trim the
    buffer over audio the next pass revises."""
    h1 = [(0.0, 0.4, "hello"), (0.4, 0.8, "goodbye")]
    h2 = [(0.0, 0.4, "hello"), (0.4, 3.0, ","), (3.0, 3.4, "world")]
    h3 = h2
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h2, h3]))
    proc.insert_audio_chunk(np.zeros(16000 * 4, dtype=np.float32))
    assert proc.process_iter() == ""          # priming
    t2 = proc.process_iter()                   # h1 vs h2: only "hello"
    assert t2 == "hello"
    # the ',' (end 3.0) must NOT have advanced the committed frontier
    assert proc.committed[-1][1] == pytest.approx(0.4)
    t3 = proc.process_iter()                   # h2 vs h3: ','+"world" land
    assert "world" in t3


def test_online_asr_frontier_adjacent_trailing_punct_commits_at_finish():
    """Whisper often stamps a trailing '.' with a span hugging the tail of
    the word it follows; once that word commits, the punct sits at/behind
    the committed frontier. The midpoint drop rule used to filter it out of
    every later hypothesis BEFORE the commit loop could pair it with a
    neighbor — sentence-final punctuation silently vanished."""
    h = [(0.0, 0.40, "hello"), (0.39, 0.40, ".")]
    proc = OnlineASRProcessor(ScriptedHypASR([h, h, h, h]))
    proc.insert_audio_chunk(np.zeros(16000, dtype=np.float32))
    assert proc.process_iter() == ""            # priming
    assert proc.process_iter() == "hello"       # punct held back, no neighbor
    assert proc.process_iter() == ""            # still held (punct only)
    final = proc.finish()
    assert "." in final
    record = [w for _, _, w in proc.committed]
    assert record == ["hello", "."]             # exactly once, in order


def test_online_asr_frontier_adjacent_punct_commits_with_next_word():
    """Same frontier-hugging '.' but speech continues: the punct must land
    (exactly once) when the following word reaches agreement."""
    h1 = [(0.0, 0.40, "hello"), (0.39, 0.40, ".")]
    h2 = h1 + [(0.8, 1.2, "world")]
    proc = OnlineASRProcessor(ScriptedHypASR([h1, h1, h2, h2, h2]))
    proc.insert_audio_chunk(np.zeros(16000 * 2, dtype=np.float32))
    assert proc.process_iter() == ""
    assert proc.process_iter() == "hello"
    assert proc.process_iter() == ""            # '.' pending, world unconfirmed
    t4 = proc.process_iter()                     # world agrees -> both commit
    assert "." in t4 and "world" in t4
    proc.process_iter()                          # extra pass: no duplicates
    record = [w for _, _, w in proc.committed]
    assert record == ["hello", ".", "world"]


def test_language_detection_sets_and_returns_language():
    """FasterWhisperASR.language_detection probes the first 30 s and pins
    self.language (reference stt_processor.py:125-133, with the tuple-unpack
    bug there fixed: transcribe returns (segments, info))."""
    from csm_mlx_tpu.apps.stt import SAMPLING_RATE, FasterWhisperASR

    class _Info:
        language = "fr"
        language_probability = 0.93

    class _FakeModel:
        def __init__(self):
            self.seen_len = None

        def transcribe(self, audio, **kw):
            self.seen_len = len(audio)
            return iter(()), _Info()

    asr = FasterWhisperASR(language="en")
    fake = _FakeModel()
    asr._model = fake  # bypass the lazy faster-whisper load
    audio = np.zeros(SAMPLING_RATE * 45, dtype=np.float32)
    detected = asr.language_detection(audio)
    assert detected == "fr"
    assert asr.language == "fr"
    assert fake.seen_len == SAMPLING_RATE * 30  # 30 s probe cap
