"""Keyed spread-spectrum audio watermarking (jittable, TPU-native).

The reference leaves watermarking as an acknowledged TODO
(/root/reference/csm_mlx/generation.py:176, /root/reference/README.md:263);
the upstream Sesame release watermarks every generated waveform. This module
closes that gap with a self-contained, fully-jittable implementation — no
external model, one `jax.jit`-able function each way, so embedding can fuse
into the generation pipeline's device program.

Scheme
------
Multiplicative spread-spectrum in the STFT magnitude domain:

- The 24 kHz waveform is analysed with a 1024-point Hann STFT (hop 512).
- A secret integer key seeds a ±1 chip matrix `C[p, b]` over `payload_len`
  payload slots × the 1–8 kHz band (bins 43..341), constant over blocks of
  4 adjacent bins. STFT frame `t` carries payload slot `t % payload_len`.
- Embedding multiplies each in-band magnitude by `1 + strength·s_p·C[p,b]`
  (`s_p = ±1` is payload bit `p`), preserving phase — a ~0.5 dB keyed
  ripple, spread across 298 bins, far below speech masking thresholds.
  Because overlapped STFT frames over-determine the signal, a raw per-bin
  modulation loses ~half its amplitude to the consistency projection at
  resynthesis (measured: gain 0.49); the 4-bin chip blocks keep the
  modulation smooth at the window-mainlobe scale and two magnitude-target
  projection iterations (set |X| to the target, keep phase, resynthesize)
  recover an effective gain of ~0.88.
- Detection double-centres the log-magnitude (per-bin temporal mean —
  removing the host's static spectral shape and any overall gain — then
  per-frame band mean), aggregates the residual per (payload slot, bin),
  and correlates the aggregate against the chip matrix. Because the chips
  are the only randomness, the null variance of each slot correlation is
  exactly `Σ_b L²` over the aggregated cells, giving a calibrated z-score
  with no training or reference signal — even on pathological (tonal,
  stationary) host audio. The presence score is the BEST (max) mean |z|
  over the payload_len rotation hypotheses; the max inflates the null
  above a single mean|z|'s 0.798: measured ≈1.05 ± 0.09 on unwatermarked
  audio (1–10 s), vs O(10) for marked audio. Bit `p` is `sign(z_p)`.

The mark survives gain changes, additive noise, 16-bit requantisation, and
trims by whole STFT hops (the detector runs a rotation search over payload
slots to re-synchronise, so both presence and payload order survive). It is
not designed to survive resampling or time-stretching (neither is the
upstream watermarker's detector without a search), and sub-hop trim offsets
attenuate the correlation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24_000
FRAME = 1024
HOP = 512
# 1–8 kHz band: low enough to ride the speech formant energy, high enough
# to stay clear of the fundamental where the ripple would be audible.
BAND_LO = int(1000 * FRAME / SAMPLE_RATE)   # 42
BAND_HI = int(8000 * FRAME / SAMPLE_RATE)   # 341
DEFAULT_PAYLOAD_LEN = 16
DEFAULT_STRENGTH = 0.06
DEFAULT_THRESHOLD = 2.0  # max-over-rotations mean|z|; measured null
#   ≈ 1.05 ± 0.09 (the rotation search takes a max over payload_len
#   hypotheses, inflating the single-rotation 0.798 null). Tune any
#   custom threshold against the MAX statistic, not the plain mean.
BIN_BLOCK = 4      # chips constant over blocks of adjacent bins (see above)
EMBED_ITERS = 2    # magnitude-target consistency projection iterations


class WatermarkResult(NamedTuple):
    present: jax.Array      # bool scalar
    score: jax.Array        # mean |z| over payload slots (best rotation)
    bits: jax.Array         # (payload_len,) recovered bits, payload order
    z: jax.Array            # (payload_len,) z-scores, payload order
    shift: jax.Array        # best slot rotation (frames trimmed mod payload_len)


def _as_key(key: Union[int, jax.Array]) -> jax.Array:
    if isinstance(key, (int, np.integer)):
        return jax.random.PRNGKey(int(key))
    return key


def _chips(key: jax.Array, payload_len: int) -> jax.Array:
    """±1 chip matrix (payload_len, band_bins), derived from the key;
    constant over BIN_BLOCK adjacent bins so the modulation survives the
    overlapped-STFT consistency projection."""
    n_bins = BAND_HI - BAND_LO
    n_cells = -(-n_bins // BIN_BLOCK)
    bern = jax.random.bernoulli(
        jax.random.fold_in(key, 0x5EED), 0.5, (payload_len, n_cells)
    )
    cells = jnp.where(bern, 1.0, -1.0).astype(jnp.float32)
    return jnp.repeat(cells, BIN_BLOCK, axis=1)[:, :n_bins]


def default_payload(key: Union[int, jax.Array], payload_len: int = DEFAULT_PAYLOAD_LEN) -> jax.Array:
    """Deterministic payload bits derived from the key (used when the caller
    does not supply its own message)."""
    return jax.random.bernoulli(
        jax.random.fold_in(_as_key(key), 0xB175), 0.5, (payload_len,)
    ).astype(jnp.int32)


def _frame_indices(n: int) -> tuple:
    n_frames = max((n - FRAME) // HOP + 1, 0)
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(FRAME)[None, :]
    return n_frames, jnp.asarray(idx)


def _stft(audio: jax.Array, idx: jax.Array, window: jax.Array) -> jax.Array:
    frames = audio[idx] * window  # (n_frames, FRAME)
    return jnp.fft.rfft(frames, axis=-1)


def embed_watermark(
    audio: jax.Array,
    key: Union[int, jax.Array],
    payload: Optional[jax.Array] = None,
    *,
    strength: float = DEFAULT_STRENGTH,
    payload_len: int = DEFAULT_PAYLOAD_LEN,
) -> jax.Array:
    """Embed a keyed watermark into a (T,) or (B, T) waveform. Jittable.

    Audio shorter than one STFT frame (1024 samples) is returned unchanged.
    `payload` is an optional (payload_len,) 0/1 bit array; by default the
    bits are derived from the key (`default_payload`).
    """
    if payload is not None:
        payload = jnp.asarray(payload)
        if payload.shape != (payload_len,):
            # A short payload would otherwise be silently clamped by JAX's
            # out-of-bounds gather (slots past its end all carry its last
            # bit against the wrong chip rows) — decode garbage, no error.
            raise ValueError(
                f"payload must have shape ({payload_len},) to match "
                f"payload_len; got {payload.shape}")
        if not isinstance(payload, jax.core.Tracer) and \
                not bool(jnp.isin(payload, jnp.asarray([0, 1])).all()):
            # ±1-valued payloads (a natural mistake given the internal sign
            # mapping) would triple the ripple on 0-bits.
            raise ValueError("payload bits must be 0/1")
    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        return jax.vmap(
            lambda a: embed_watermark(a, key, payload, strength=strength,
                                      payload_len=payload_len)
        )(audio)
    key = _as_key(key)
    n = audio.shape[0]
    n_frames, idx = _frame_indices(n)
    if n_frames == 0:
        return audio

    in_dtype = audio.dtype
    x = audio.astype(jnp.float32)
    window = jnp.asarray(np.hanning(FRAME + 1)[:FRAME], dtype=jnp.float32)

    chips = _chips(key, payload_len)                     # (P, B)
    bits = default_payload(key, payload_len) if payload is None else payload
    signs = (2 * bits.astype(jnp.float32) - 1.0)         # (P,)
    slot = jnp.arange(n_frames) % payload_len            # (F,)
    mod = 1.0 + strength * signs[slot][:, None] * chips[slot]   # (F, B)

    def wola(spec):
        # Weighted overlap-add resynthesis: out = OLA(w·iSTFT) / OLA(w²);
        # the same synthesis window cancels analysis windowing exactly
        # where the window-power sum is nonzero (interior), and we fall
        # back to the input signal at the uncovered tail/edges.
        frames = jnp.fft.irfft(spec, n=FRAME, axis=-1) * window
        num = jnp.zeros((n,), jnp.float32).at[idx].add(frames)
        den = jnp.zeros((n,), jnp.float32).at[idx].add(window * window)
        covered = den > 1e-6
        return jnp.where(covered, num / jnp.where(covered, den, 1.0), x)

    # Target magnitudes: the clean band magnitudes times the keyed ripple.
    # Overlapped frames over-determine the waveform, so a single magnitude
    # substitution only realises ~half the ripple; iterating "set magnitude
    # to target, keep current phase, resynthesize" projects onto the
    # consistent-STFT set and recovers ~0.88 of it (module docstring).
    spec = _stft(x, idx, window)  # shared: clean target AND iteration 1
    target = jnp.abs(spec[:, BAND_LO:BAND_HI]) * mod
    for it in range(EMBED_ITERS):
        if it:
            spec = _stft(wm, idx, window)
        band = spec[:, BAND_LO:BAND_HI]
        scale = target / (jnp.abs(band) + 1e-12)
        wm = wola(spec.at[:, BAND_LO:BAND_HI].set(band * scale.astype(band.dtype)))
    if jnp.issubdtype(in_dtype, jnp.integer):
        # The ripple can push near-full-scale samples past the integer
        # range, and XLA float->int conversion of out-of-range values is
        # platform-dependent (wrap = audible clicks at the loudest points):
        # round and clip explicitly, like the WAV writers do.
        info = jnp.iinfo(in_dtype)
        wm = jnp.clip(jnp.round(wm), info.min, info.max)
    return wm.astype(in_dtype)


def detect_watermark(
    audio: jax.Array,
    key: Union[int, jax.Array],
    *,
    payload_len: int = DEFAULT_PAYLOAD_LEN,
    threshold: float = DEFAULT_THRESHOLD,
) -> WatermarkResult:
    """Detect/decode a watermark embedded with the same key. Jittable.

    Gain-invariant (log-magnitude feature) and calibrated: on unwatermarked
    audio the per-slot z-scores are ~N(0, 1). `score` is the max over the
    payload_len rotation hypotheses of mean |z|, so its null sits near 1.05
    (NOT the single-rotation 0.798) regardless of content; `present`
    compares it to `threshold`.
    """
    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        return jax.vmap(
            lambda a: detect_watermark(a, key, payload_len=payload_len,
                                       threshold=threshold)
        )(audio)
    key = _as_key(key)
    n = audio.shape[0]
    n_frames, idx = _frame_indices(n)
    if n_frames == 0:
        z = jnp.zeros((payload_len,), jnp.float32)
        return WatermarkResult(jnp.asarray(False), jnp.asarray(0.0, jnp.float32),
                               jnp.zeros((payload_len,), jnp.int32), z,
                               jnp.asarray(0, jnp.int32))

    x = audio.astype(jnp.float32)
    window = jnp.asarray(np.hanning(FRAME + 1)[:FRAME], dtype=jnp.float32)
    spec = _stft(x, idx, window)
    mag = jnp.abs(spec[:, BAND_LO:BAND_HI])              # (F, B)
    # Floor tiny bins relative to the frame's band energy so silent bins
    # (log → −inf) cannot dominate the correlation.
    floor = 1e-3 * jnp.max(mag, axis=1, keepdims=True) + 1e-12
    logm = jnp.log(mag + floor)
    # Double centring: per-bin temporal mean removes the host's static
    # spectrum (and any gain); per-frame band mean removes loudness motion.
    logm = logm - jnp.mean(logm, axis=0, keepdims=True)
    logm = logm - jnp.mean(logm, axis=1, keepdims=True)

    # Matched filter: aggregate residuals per (payload slot, bin), then
    # correlate with the chips. The chips are the only randomness and are
    # CONSTANT over each BIN_BLOCK cell, so r_p = Σ_b L[p,b]·C[q,b]
    # = Σ_cells C_cell · (Σ_{b∈cell} L[p,b]) and its exact null variance is
    # Σ_cells (Σ_{b∈cell} L[p,b])² — summing L² per *bin* instead would
    # underestimate it (up to BIN_BLOCK×) on smooth spectra whose residuals
    # correlate within a cell, inflating |z| on unwatermarked audio.
    chips = _chips(key, payload_len)                     # (P, B)
    slot = jnp.arange(n_frames) % payload_len            # (F,)
    onehot = jax.nn.one_hot(slot, payload_len, dtype=jnp.float32)  # (F, P)
    L = onehot.T @ logm                                  # (P, B)
    n_bins = BAND_HI - BAND_LO
    n_cells = -(-n_bins // BIN_BLOCK)
    cell = jnp.pad(L, ((0, 0), (0, n_cells * BIN_BLOCK - n_bins))).reshape(
        payload_len, n_cells, BIN_BLOCK).sum(axis=-1)    # (P, cells)
    v = jnp.sum(cell * cell, axis=1)                     # (P,) exact null var

    # Rotation (sync) search: trimming k frames off the head moves payload
    # slot (p+k)%P into detector group p. Correlate every group against
    # every chip row once, then score each rotation's diagonal.
    zmat = (L @ chips.T) / jnp.sqrt(v + 1e-12)[:, None]  # (P groups, P rows)
    p_idx = jnp.arange(payload_len)
    all_z = zmat[p_idx[None, :], (p_idx[None, :] + p_idx[:, None]) % payload_len]
    scores = jnp.mean(jnp.abs(all_z), axis=1)            # (P rotations,)
    best = jnp.argmax(scores)
    score = scores[best]
    # Group p estimates bit (p+best)%P: roll back into payload order.
    z = jnp.roll(all_z[best], best)
    bits = (z > 0).astype(jnp.int32)
    return WatermarkResult(score > threshold, score, bits, z,
                           best.astype(jnp.int32))


def check_payload(result: WatermarkResult, key: Union[int, jax.Array],
                  payload_len: int = DEFAULT_PAYLOAD_LEN) -> jax.Array:
    """True iff the recovered bits match the key's default payload (the
    detector's rotation search already restores payload order). Reduces
    over the payload axis only, so batched detections get per-row
    verdicts, not one bool collapsed across the batch."""
    return jnp.all(result.bits == default_payload(key, payload_len), axis=-1)
