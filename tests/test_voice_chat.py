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


# ---------------------------------------------------------------------------
# OnlineASRProcessor with a fake backend
# ---------------------------------------------------------------------------


class FakeASR:
    """Transcribes 1 'word' per second of audio, deterministic."""

    def transcribe(self, audio, init_prompt=""):
        seconds = int(len(audio) / 16000)
        return [AsrSegment(i, i + 1, f"word{i}") for i in range(seconds)]


def test_online_asr_commits_and_trims():
    proc = OnlineASRProcessor(FakeASR())
    proc.insert_audio_chunk(np.zeros(16000 * 4, dtype=np.float32))
    text = proc.process_iter()
    # 4s buffer: segments ending <= 2.5s are committed (margin 1.5s)
    assert "word0" in text and "word1" in text
    assert proc.buffer_time_offset > 0  # trimmed
    final = proc.finish()
    assert isinstance(final, str)
    assert len(proc.audio_buffer) == 0


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
