"""Host-side utilities: audio I/O, resampling, profiling helpers."""

from csm_mlx_tpu.utils.audio import read_audio, resample, write_audio

__all__ = ["read_audio", "write_audio", "resample"]
