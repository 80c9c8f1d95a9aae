"""Watermark embed/detect: calibration, payload recovery, robustness.

Covers the capability the reference leaves as TODO
(/root/reference/csm_mlx/generation.py:176): keyed presence detection,
payload bits, gain/noise/requantisation robustness, and distortion bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_mlx_tpu.watermark import (
    DEFAULT_PAYLOAD_LEN,
    SAMPLE_RATE,
    WatermarkResult,
    check_payload,
    default_payload,
    detect_watermark,
    embed_watermark,
)

KEY = 42
WRONG_KEY = 43


def speechlike(seconds: float = 5.0, seed: int = 0) -> np.ndarray:
    """Speech-shaped test signal: 1/f-ish coloured noise + moving formants."""
    rng = np.random.RandomState(seed)
    n = int(seconds * SAMPLE_RATE)
    spec = np.fft.rfft(rng.randn(n))
    freqs = np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE)
    shape = 1.0 / np.sqrt(1.0 + (freqs / 500.0) ** 2)
    x = np.fft.irfft(spec * shape, n=n)
    t = np.arange(n) / SAMPLE_RATE
    for f0 in (220.0, 700.0, 1600.0, 3100.0):
        x += 0.15 * np.sin(2 * np.pi * (f0 + 30 * np.sin(2 * np.pi * 0.7 * t)) * t)
    x *= 0.1 / np.sqrt(np.mean(x**2))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def marked():
    clean = speechlike()
    wm = np.asarray(embed_watermark(clean, KEY))
    return clean, wm


def test_detects_right_key_only(marked):
    clean, wm = marked
    hit = detect_watermark(wm, KEY)
    assert bool(hit.present), float(hit.score)
    # margin calibrated to the cell-exact null variance (the per-bin
    # variance formula used to overstate z by ~15% on this host)
    assert float(hit.score) > 3.0
    miss_key = detect_watermark(wm, WRONG_KEY)
    assert not bool(miss_key.present), float(miss_key.score)
    miss_clean = detect_watermark(clean, KEY)
    assert not bool(miss_clean.present), float(miss_clean.score)
    # Null calibration: unwatermarked score sits near E|N(0,1)| = 0.8.
    assert float(miss_clean.score) < 1.5


def test_payload_roundtrip(marked):
    _, wm = marked
    res = detect_watermark(wm, KEY)
    assert bool(check_payload(res, KEY))
    custom = jnp.asarray([1, 0] * (DEFAULT_PAYLOAD_LEN // 2), dtype=jnp.int32)
    wm2 = embed_watermark(speechlike(seed=1), KEY, payload=custom)
    res2 = detect_watermark(wm2, KEY)
    assert bool(res2.present)
    np.testing.assert_array_equal(np.asarray(res2.bits), np.asarray(custom))


def test_distortion_is_small(marked):
    clean, wm = marked
    snr = 10 * np.log10(np.mean(clean**2) / (np.mean((wm - clean) ** 2) + 1e-12))
    assert snr > 20.0, f"watermark too loud: {snr:.1f} dB SNR"


def test_survives_gain_noise_and_requantisation(marked):
    _, wm = marked
    rng = np.random.RandomState(7)
    assert bool(detect_watermark(wm * 0.2, KEY).present)
    assert bool(detect_watermark(wm * 3.0, KEY).present)
    noisy = wm + (10 ** (-30 / 20)) * np.sqrt(np.mean(wm**2)) * rng.randn(wm.size)
    assert bool(detect_watermark(noisy.astype(np.float32), KEY).present)
    q16 = (np.clip(wm, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32767
    res = detect_watermark(q16, KEY)
    assert bool(res.present) and bool(check_payload(res, KEY))


def test_survives_trimming(marked):
    _, wm = marked
    from csm_mlx_tpu.watermark import HOP

    head_trimmed = wm[HOP * 47:]  # drop ~1 s, a whole number of STFT hops
    res = detect_watermark(head_trimmed, KEY)
    assert bool(res.present)
    # Payload survives up to the slot rotation the trim induces.
    assert bool(check_payload(res, KEY))


def test_jit_and_batch(marked):
    clean, _ = marked
    short = clean[: SAMPLE_RATE * 2]
    batch = np.stack([short, speechlike(2.0, seed=3)])
    wm = jax.jit(lambda a: embed_watermark(a, KEY))(batch)
    res = jax.jit(lambda a: detect_watermark(a, KEY))(wm)
    assert isinstance(res, WatermarkResult)
    assert res.present.shape == (2,) and bool(res.present.all())


def test_short_audio_passthrough():
    tiny = np.zeros(100, dtype=np.float32)
    out = embed_watermark(tiny, KEY)
    np.testing.assert_array_equal(np.asarray(out), tiny)
    res = detect_watermark(tiny, KEY)
    assert not bool(res.present)


def test_default_payload_deterministic():
    a = np.asarray(default_payload(KEY))
    b = np.asarray(default_payload(KEY))
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)) <= {0, 1}


def test_embed_rejects_bad_payloads():
    """A short payload would be silently clamped by JAX's out-of-bounds
    gather (half the slots carry the wrong bit); ±1 payloads would triple
    the ripple on 0-bits. Both must raise."""
    import pytest

    audio = np.sin(np.linspace(0, 400, 24000)).astype(np.float32)
    with pytest.raises(ValueError, match="shape"):
        embed_watermark(audio, 7, payload=np.ones(8, np.int32))
    with pytest.raises(ValueError, match="0/1"):
        embed_watermark(audio, 7,
                        payload=(np.arange(16) % 2 * 2 - 1).astype(np.int32))


def test_embed_int16_clips_instead_of_wrapping():
    """Near-full-scale int16 input: the ±6% ripple must clip at the rail,
    never wrap to large negative values (audible clicks at the loudest
    points)."""
    loud = (np.sin(np.linspace(0, 400, 24000)) * 32600).astype(np.int16)
    wm = np.asarray(embed_watermark(loud, 7))
    assert wm.dtype == np.int16
    # wrap-around would show as a sample jumping the full range
    assert np.abs(wm.astype(np.int32) - loud.astype(np.int32)).max() < 8000
