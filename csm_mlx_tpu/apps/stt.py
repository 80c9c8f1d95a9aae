"""Streaming speech-to-text front-end for the voice-chat app.

Capability parity with `/root/reference/stt_processor.py` (itself derived
from ufal/whisper_streaming, MIT): a lazily-loaded ASR backend wrapper plus
`OnlineASRProcessor`, which maintains a growing audio buffer, runs
incremental transcription, accumulates a text prompt for conditioning, and
trims the buffer to just before the last committed segment end.

The ASR backend is pluggable (`AsrBackend` protocol): `FasterWhisperASR`
works when the faster-whisper package is installed (it is not part of this
image); tests and offline use can plug any callable backend.
"""

from __future__ import annotations

import logging
from typing import Iterable, List, Optional, Protocol, Tuple

import numpy as np

logger = logging.getLogger(__name__)

SAMPLING_RATE = 16000


class AsrSegment:
    """One transcribed segment with word-level timestamps (optional)."""

    def __init__(self, start: float, end: float, text: str,
                 no_speech_prob: float = 0.0):
        self.start = start
        self.end = end
        self.text = text
        self.no_speech_prob = no_speech_prob


class AsrBackend(Protocol):
    def transcribe(self, audio: np.ndarray, init_prompt: str = ""
                   ) -> List[AsrSegment]:
        ...


class FasterWhisperASR:
    """Lazy wrapper over faster-whisper (stt_processor.py:67-133)."""

    sep = ""

    def __init__(self, model_size: str = "large-v3", device: str = "auto",
                 compute_type: str = "auto", language: Optional[str] = "en",
                 vad_filter: bool = True):
        self.model_size = model_size
        self.device = device
        self.compute_type = compute_type
        self.language = language
        self.vad_filter = vad_filter
        self._model = None

    def _load(self):
        if self._model is None:
            from faster_whisper import WhisperModel  # optional dependency

            logger.info("Loading whisper model %s...", self.model_size)
            self._model = WhisperModel(self.model_size, device=self.device,
                                       compute_type=self.compute_type)
        return self._model

    def transcribe(self, audio: np.ndarray, init_prompt: str = ""
                   ) -> List[AsrSegment]:
        model = self._load()
        segments, _info = model.transcribe(
            audio,
            language=self.language,
            initial_prompt=init_prompt,
            beam_size=5,
            word_timestamps=True,
            condition_on_previous_text=True,
            vad_filter=self.vad_filter,
        )
        out = []
        for seg in segments:
            out.append(AsrSegment(seg.start, seg.end, seg.text,
                                  getattr(seg, "no_speech_prob", 0.0)))
        return out


class OnlineASRProcessor:
    """Incremental transcription over a growing buffer
    (stt_processor.py:135-254).

    insert_audio_chunk() appends 16 kHz mono audio; process_iter() runs the
    backend over the whole buffer, commits every segment that ends >=1.5 s
    before the buffer end (stable region), trims the buffer to the last
    committed segment end - 1.5 s, and returns the newly committed text.
    finish() flushes whatever remains.
    """

    TRIM_MARGIN_S = 1.5
    NO_SPEECH_THRESHOLD = 0.9

    def __init__(self, asr: AsrBackend, buffer_trimming_sec: float = 15.0):
        self.asr = asr
        self.buffer_trimming_sec = buffer_trimming_sec
        self.init()

    def init(self):
        self.audio_buffer = np.zeros((0,), dtype=np.float32)
        self.buffer_time_offset = 0.0
        self.committed: List[Tuple[float, float, str]] = []
        self.prompt_text = ""

    def insert_audio_chunk(self, audio: np.ndarray):
        self.audio_buffer = np.append(
            self.audio_buffer, np.asarray(audio, dtype=np.float32))

    def _buffer_end_time(self) -> float:
        return self.buffer_time_offset + len(self.audio_buffer) / SAMPLING_RATE

    def process_iter(self) -> str:
        """Transcribe the buffer; return newly committed text ("" if none)."""
        if len(self.audio_buffer) < SAMPLING_RATE // 2:
            return ""
        segments = self.asr.transcribe(self.audio_buffer,
                                       init_prompt=self.prompt_text[-200:])
        end_time = len(self.audio_buffer) / SAMPLING_RATE
        new_text: List[str] = []
        last_committed_end = None
        for seg in segments:
            if seg.no_speech_prob > self.NO_SPEECH_THRESHOLD:
                continue
            if seg.end <= end_time - self.TRIM_MARGIN_S:
                abs_start = seg.start + self.buffer_time_offset
                abs_end = seg.end + self.buffer_time_offset
                self.committed.append((abs_start, abs_end, seg.text))
                new_text.append(seg.text)
                last_committed_end = seg.end
        if last_committed_end is not None:
            self._trim_to(last_committed_end - self.TRIM_MARGIN_S)
        elif end_time > self.buffer_trimming_sec:
            # Safety valve: no commits but the buffer keeps growing.
            self._trim_to(end_time - self.buffer_trimming_sec)
        text = " ".join(t.strip() for t in new_text if t.strip())
        if text:
            self.prompt_text = (self.prompt_text + " " + text).strip()
        return text

    def _trim_to(self, t: float):
        if t <= 0:
            return
        cut = int(t * SAMPLING_RATE)
        cut = min(cut, len(self.audio_buffer))
        self.audio_buffer = self.audio_buffer[cut:]
        self.buffer_time_offset += cut / SAMPLING_RATE

    def finish(self) -> str:
        """Flush: transcribe and commit everything left (stt:245-254)."""
        if len(self.audio_buffer) < SAMPLING_RATE // 10:
            return ""
        segments = self.asr.transcribe(self.audio_buffer,
                                       init_prompt=self.prompt_text[-200:])
        texts = [s.text for s in segments
                 if s.no_speech_prob <= self.NO_SPEECH_THRESHOLD]
        self.audio_buffer = np.zeros((0,), dtype=np.float32)
        text = " ".join(t.strip() for t in texts if t.strip())
        if text:
            self.prompt_text = (self.prompt_text + " " + text).strip()
        return text
