"""Numeric kernels and primitive ops (XLA-first, Pallas fast paths)."""
