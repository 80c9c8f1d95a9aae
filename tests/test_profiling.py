"""Profiling utility tests (SURVEY.md §5.1 equivalent)."""

import time

from csm_mlx_tpu.utils.profiling import RtfMeter, annotate


def test_rtf_meter():
    m = RtfMeter(frame_seconds=0.08)
    m.start()
    time.sleep(0.01)
    m.tick()
    m.tick(3)
    rtf = m.stop()
    assert rtf > 0
    assert m.first_chunk_latency_s is not None
    assert m.first_chunk_latency_s >= 0.01
    assert m.history == [rtf]


def test_annotate_contextmanager():
    with annotate("test-span"):
        pass


def test_rtf_meter_stop_requires_start():
    import pytest

    m = RtfMeter(frame_seconds=0.08)
    with pytest.raises(RuntimeError, match="stop"):
        m.stop()
    m.start()
    m.tick()
    m.stop()
    with pytest.raises(RuntimeError, match="stop"):
        m.stop()  # double-stop would re-measure from a stale start
