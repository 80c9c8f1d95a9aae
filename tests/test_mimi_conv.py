"""Streaming conv primitives must be bit-compatible with the batch path."""

import numpy as np
import jax
import jax.numpy as jnp

from csm_mlx_tpu.models.mimi.conv import (
    causal_conv1d,
    causal_conv1d_streaming,
    causal_conv_transpose1d,
    causal_conv_transpose1d_streaming,
    make_conv_state,
    make_convtr_state,
)


def _params(c_out, c_in, k, seed=0, bias=True):
    rng = np.random.RandomState(seed)
    p = {"weight": jnp.asarray(rng.randn(c_out, c_in, k).astype(np.float32) * 0.3)}
    if bias:
        p["bias"] = jnp.asarray(rng.randn(c_out).astype(np.float32) * 0.1)
    return p


def test_streaming_conv_matches_batch():
    for k, stride, dilation in [(7, 1, 1), (3, 1, 2), (8, 4, 1), (4, 2, 1), (1, 1, 1)]:
        p = _params(5, 3, k, seed=k)
        T = 24
        x = jnp.asarray(np.random.RandomState(1).randn(2, 3, T).astype(np.float32))
        full = causal_conv1d(p, x, stride=stride, dilation=dilation)

        state = make_conv_state(3, k, stride, dilation, 2)
        outs = []
        chunk = stride * 2
        for i in range(0, T, chunk):
            o, state = causal_conv1d_streaming(
                p, x[:, :, i : i + chunk], state, stride=stride, dilation=dilation
            )
            outs.append(o)
        stream = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(stream), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k} s={stride} d={dilation}",
        )


def test_streaming_convtr_matches_batch():
    for k, stride, groups in [(8, 4, 1), (4, 2, 1), (16, 8, 1), (4, 2, 3)]:
        c = 3
        c_out = 6 if groups == 1 else 3
        p = {"weight": jnp.asarray(
            np.random.RandomState(k).randn(c, c_out // groups if groups > 1 else c_out, k)
            .astype(np.float32) * 0.3)}
        if groups > 1:
            # depthwise-ish: c_in=3 groups=3 -> weight (3, c_out/groups, k)
            p["weight"] = jnp.asarray(
                np.random.RandomState(k).randn(c, 1, k).astype(np.float32) * 0.3)
            c_out = 3
        p["bias"] = jnp.asarray(np.random.RandomState(k + 1).randn(c_out)
                                .astype(np.float32) * 0.1)
        T = 12
        x = jnp.asarray(np.random.RandomState(2).randn(1, c, T).astype(np.float32))
        full = causal_conv_transpose1d(p, x, stride=stride, groups=groups)

        state = make_convtr_state(c_out, k, stride, 1)
        outs = []
        for i in range(0, T, 2):
            o, state = causal_conv_transpose1d_streaming(
                p, x[:, :, i : i + 2], state, stride=stride, groups=groups
            )
            outs.append(o)
        stream = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(stream), rtol=1e-5, atol=1e-5,
            err_msg=f"k={k} s={stride} g={groups}",
        )

def test_streaming_conv_rejects_partial_stride_chunk():
    """A chunk that doesn't end on a stride boundary would silently shift
    every later output (the carried context assumes whole windows) — the
    streaming conv must raise instead, like its transposed sibling."""
    import pytest

    p = _params(5, 3, 4, seed=3)
    state = make_conv_state(3, 4, 2, 1, 2)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 3, 3).astype(np.float32))
    with pytest.raises(ValueError, match="multiple"):
        causal_conv1d_streaming(p, x, state, stride=2)
