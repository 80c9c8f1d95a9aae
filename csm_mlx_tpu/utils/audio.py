"""Audio I/O + resampling (parity with csm_mlx/utils.py:9-27).

`read_audio(path, sampling_rate)` loads any WAV, mixes to mono, and
resamples — the reference uses the audiofile/audresample C libraries; here a
self-built native module (`native/audio_native.cpp`, C++ polyphase
windowed-sinc resampler + RIFF parser) does the work through ctypes, with a
pure-Python/scipy fallback chain:

  native .so  ->  stdlib `wave` + scipy.signal.resample_poly

The native module is compiled on demand (g++ is in the image); failures fall
through silently to the Python path so the framework stays importable
anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_SO = os.path.join(os.path.dirname(__file__), "_audio_native.so")
_NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "audio_native.cpp",
)


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("frames", ctypes.c_int64),
    ]


_lib = None
_lib_tried = False


def _native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        stale = (
            os.path.exists(_NATIVE_SO)
            and os.path.exists(_NATIVE_SRC)
            and os.path.getmtime(_NATIVE_SRC) > os.path.getmtime(_NATIVE_SO)
        )
        if (stale or not os.path.exists(_NATIVE_SO)) and os.path.exists(_NATIVE_SRC):
            # Compile to a per-process temp name and atomically rename:
            # concurrent first-use across processes must never dlopen a
            # half-written .so (a truncated ELF usually raises, a mid-write
            # mapping can segfault).
            tmp_so = f"{_NATIVE_SO}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp_so, _NATIVE_SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, _NATIVE_SO)
        lib = ctypes.CDLL(_NATIVE_SO)
        lib.wav_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                                 ctypes.POINTER(_WavInfo)]
        lib.wav_read.restype = ctypes.c_int
        lib.wav_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.wav_write.restype = ctypes.c_int
        lib.mixdown.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                                ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        lib.resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                         ctypes.c_int32]
        lib.resample_out_len.restype = ctypes.c_int64
        lib.resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.resample.restype = ctypes.c_int
        lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Mono float32 resample."""
    audio = np.ascontiguousarray(np.asarray(audio, dtype=np.float32).reshape(-1))
    if sr_in == sr_out:
        return audio
    lib = _native()
    if lib is not None:
        n_out = lib.resample_out_len(len(audio), sr_in, sr_out)
        out = np.empty(int(n_out), dtype=np.float32)
        if lib.resample(_f32p(audio), len(audio), sr_in, sr_out, _f32p(out)) == 0:
            return out
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr_in, sr_out)
    return resample_poly(audio, sr_out // g, sr_in // g).astype(np.float32)


def read_audio(audio_path, sampling_rate: int = 24000) -> np.ndarray:
    """Read WAV -> resample -> mono mixdown -> float32 array (utils.py:9-21)."""
    path = str(audio_path)
    lib = _native()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_float)()
        info = _WavInfo()
        rc = lib.wav_read(path.encode(), ctypes.byref(out), ctypes.byref(info))
        if rc == 0:
            total = int(info.frames) * int(info.channels)
            data = np.ctypeslib.as_array(out, shape=(total,)).copy()
            lib.free_buffer(out)
            if info.channels > 1:
                # native mixdown (f64 accumulation per frame)
                mono = np.empty(int(info.frames), dtype=np.float32)
                lib.mixdown(_f32p(np.ascontiguousarray(data)),
                            int(info.frames), int(info.channels),
                            _f32p(mono))
                data = mono
            return resample(data, int(info.sample_rate), sampling_rate)
    # stdlib fallback (PCM16/PCM32 WAV only)
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"Unsupported WAV sample width {sw} for {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return resample(data, sr, sampling_rate)


def write_audio(audio, audio_path, sampling_rate: int = 24000) -> None:
    """Write mono float32 audio to WAV (utils.py:24-27)."""
    data = np.ascontiguousarray(np.asarray(audio, dtype=np.float32).reshape(-1))
    path = str(audio_path)
    lib = _native()
    if lib is not None:
        if lib.wav_write(path.encode(), _f32p(data), len(data), 1,
                         sampling_rate, 16) == 0:
            return
    import wave

    pcm = (np.clip(data, -1.0, 1.0) * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sampling_rate)
        w.writeframes(pcm.tobytes())
