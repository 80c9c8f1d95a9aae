"""Profiling / tracing hooks (SURVEY.md §5.1 TPU equivalent).

The reference's only instrumentation is wall-clock latency bookkeeping in
the demo (`run_streaming_csm_mlx.py:74-77`, `:207-226`). Here:

- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-compatible device trace of everything inside.
- `annotate(name)`: `jax.profiler.TraceAnnotation` wrapper for host-side
  spans inside a trace.
- `RtfMeter`: running real-time-factor / first-chunk-latency meter for
  generation loops (the BASELINE.json metrics).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class RtfMeter:
    """Tracks frames emitted vs wall time -> RTF, plus first-chunk latency."""

    frame_seconds: float = 0.08
    _start: Optional[float] = None
    _frames: int = 0
    _first_chunk_s: Optional[float] = None
    history: List[float] = field(default_factory=list)

    def start(self) -> None:
        self._start = time.perf_counter()
        self._frames = 0
        self._first_chunk_s = None

    def tick(self, n_frames: int = 1) -> None:
        if self._start is None:
            # Auto-starting here would time from INSIDE the first tick:
            # first-chunk latency reads ~0 and the (slowest, compile-paying)
            # first frame drops out of the RTF — plausible-looking wrong
            # numbers instead of an error.
            raise RuntimeError("RtfMeter.tick() before start()")
        self._frames += n_frames
        if self._first_chunk_s is None:
            self._first_chunk_s = time.perf_counter() - self._start

    def stop(self) -> float:
        if self._start is None:
            # Same contract as tick(): stop() without (or twice per) start()
            # must error, not append a plausible-looking garbage RTF.
            raise RuntimeError("RtfMeter.stop() before start()")
        elapsed = time.perf_counter() - self._start
        self._start = None
        rtf = (self._frames * self.frame_seconds) / elapsed if elapsed else 0.0
        self.history.append(rtf)
        return rtf

    @property
    def first_chunk_latency_s(self) -> Optional[float]:
        return self._first_chunk_s
