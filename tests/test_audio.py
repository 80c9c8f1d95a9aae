"""Native audio module tests: WAV roundtrip, resampling, mixdown
(capability parity with csm_mlx/utils.py:9-27, implemented in
native/audio_native.cpp + fallbacks)."""

import numpy as np
import pytest

from csm_mlx_tpu.utils.audio import _native, read_audio, resample, write_audio


def test_wav_roundtrip_16bit(tmp_path):
    sr = 24000
    t = np.linspace(0, 0.5, sr // 2, endpoint=False)
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    write_audio(x, path, sr)
    y = read_audio(path, sr)
    assert y.shape == x.shape
    # 16-bit quantization error bound
    assert np.abs(y - x).max() < 2.0 / 32768 + 1e-6


def test_resample_preserves_tone(tmp_path):
    sr_in, sr_out, f = 16000, 24000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert len(y) == sr_out
    # dominant frequency must stay at 440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * sr_out / len(y)
    assert abs(peak_hz - f) < 2.0


def test_resample_identity():
    x = np.random.RandomState(0).randn(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 24000, 24000), x)


def test_downsample_antialiases():
    """Energy above the new Nyquist must be rejected."""
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    hi = np.sin(2 * np.pi * 15000 * t).astype(np.float32)  # above 8 kHz
    y = resample(hi, sr_in, sr_out)
    rms_in = np.sqrt(np.mean(hi ** 2))
    rms_out = np.sqrt(np.mean(y[100:-100] ** 2))
    assert rms_out < 0.05 * rms_in


def test_native_library_loaded():
    # The image ships g++; the native module must build and load here.
    assert _native() is not None


def test_stereo_mixdown(tmp_path):
    """Native reader must mix multi-channel files to mono."""
    lib = _native()
    # No silent degradation: on Linux (CI/the image) the native module must
    # have built — a stale or broken .so fails here instead of skipping.
    assert lib is not None, "native audio module failed to build/load"
    import ctypes

    sr = 8000
    left = np.ones(100, dtype=np.float32) * 0.5
    right = np.zeros(100, dtype=np.float32)
    inter = np.empty(200, dtype=np.float32)
    inter[0::2] = left
    inter[1::2] = right
    path = str(tmp_path / "stereo.wav")
    rc = lib.wav_write(path.encode(),
                       inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       100, 2, sr, 16)
    assert rc == 0
    y = read_audio(path, sr)
    np.testing.assert_allclose(y, np.full(100, 0.25), atol=2e-4)


def test_malformed_wavs_never_crash(tmp_path):
    """Truncated/garbage WAVs must raise Python errors (or be rejected by
    the native parser's bounds checks), never segfault. Covers the fmt-chunk
    overread class (ADVICE r1: chunk_len past EOF)."""
    import numpy as np

    from csm_mlx_tpu.utils.audio import read_audio, write_audio

    good = tmp_path / "good.wav"
    write_audio(np.zeros(2400, np.float32), good, 24000)
    blob = bytearray(good.read_bytes())

    cases = {
        "truncated": bytes(blob[: len(blob) // 3]),
        "fmt_len_overflow": bytes(
            blob[:16] + (0x7FFFFFF0).to_bytes(4, "little") + blob[20:40]),
        "garbage": bytes(np.random.RandomState(0).bytes(256)),
        "empty": b"",
        "riff_only": b"RIFF\x00\x00\x00\x00WAVE",
    }
    rng = np.random.RandomState(1)
    for i in range(20):  # random corruptions of a valid file
        b = bytearray(blob)
        for _ in range(8):
            b[rng.randint(0, len(b))] = rng.randint(0, 256)
        cases[f"fuzz{i}"] = bytes(b)

    for name, payload in cases.items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(payload)
        try:
            out = read_audio(p, 24000)
            assert out.ndim == 1  # parsed despite corruption: fine
        except Exception:
            pass  # Python-level rejection is the required behavior


def test_wav_chunk_len_uint32_wrap_terminates(tmp_path):
    """A chunk declaring len 0xFFFFFFF7 (odd) makes `8 + len + pad` wrap to
    exactly 0 in uint32 — the native chunk walk used to loop forever on it,
    wedging the process inside native code with the GIL held."""
    import signal

    from csm_mlx_tpu.utils.audio import read_audio

    blob = bytearray()
    blob += b"RIFF" + (0x100).to_bytes(4, "little") + b"WAVE"
    blob += b"JUNK" + (0xFFFFFFF7).to_bytes(4, "little") + b"\x00" * 64
    p = tmp_path / "wrap.wav"
    p.write_bytes(bytes(blob))

    def _bail(signum, frame):  # convert a regression back into a failure
        raise AssertionError("read_audio hung on uint32 chunk-length wrap")

    old = signal.signal(signal.SIGALRM, _bail)
    signal.alarm(30)
    try:
        with pytest.raises(Exception):
            read_audio(p, 24000)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
