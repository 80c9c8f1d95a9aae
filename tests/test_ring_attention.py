"""Ring attention (parallel/sequence.py) vs single-device sdpa."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_mlx_tpu.ops.attention import causal_mask_bias, sdpa
from csm_mlx_tpu.parallel import create_mesh
from csm_mlx_tpu.parallel.sequence import ring_sdpa, shard_sequence


def _qkv(b=2, n_heads=4, n_kv=2, s=32, d=16, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, n_heads, s, d), dtype)
    k = jax.random.normal(ks[1], (b, n_kv, s, d), dtype)
    v = jax.random.normal(ks[2], (b, n_kv, s, d), dtype)
    return q, k, v


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_ring_sdpa_matches_sdpa(n_seq):
    q, k, v = _qkv()
    scale = q.shape[-1] ** -0.5
    ref = sdpa(q, k, v, scale, causal_mask_bias(q.shape[2], q.shape[2]))

    mesh = create_mesh({"seq": n_seq}, devices=jax.devices()[:n_seq])
    out = ring_sdpa(shard_sequence(q, mesh), shard_sequence(k, mesh),
                    shard_sequence(v, mesh), scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_ring_sdpa_gradients_match():
    """Backward through scan+ppermute: grads wrt q/k/v match sdpa's."""
    q, k, v = _qkv(s=16)
    scale = q.shape[-1] ** -0.5
    mesh = create_mesh({"seq": 4}, devices=jax.devices()[:4])

    def ref_loss(q, k, v):
        o = sdpa(q, k, v, scale, causal_mask_bias(q.shape[2], q.shape[2]))
        return jnp.sum(o ** 2)

    def ring_loss(q, k, v):
        return jnp.sum(ring_sdpa(q, k, v, scale, mesh) ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_ring_sdpa_bf16_and_indivisible():
    q, k, v = _qkv(s=24, dtype=jnp.bfloat16)
    scale = q.shape[-1] ** -0.5
    mesh = create_mesh({"seq": 4}, devices=jax.devices()[:4])
    ref = sdpa(q, k, v, scale, causal_mask_bias(24, 24))
    out = ring_sdpa(q, k, v, scale, mesh)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)
    with pytest.raises(ValueError):
        ring_sdpa(q[:, :, :22], k[:, :, :22], v[:, :, :22], scale, mesh)
