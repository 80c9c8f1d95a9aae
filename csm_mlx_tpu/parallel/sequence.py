"""Ring attention: sequence parallelism over a "seq" mesh axis.

The reference hard-caps context at `max_position_embeddings` and has no
sequence parallelism (SURVEY.md §5.7 — `generation.py:131-137` just
refuses long prompts). This module is the idiomatic TPU scale-out route
noted there: shard the sequence dimension over ICI, keep every chip's
attention working set O(S/n), and stream K/V shards around a ring with
`jax.lax.ppermute` (Liu et al., "Ring Attention with Blockwise
Transformers" — the public recipe; no reference code involved).

Mechanics:

- Q, K, V are sharded (B, H, S/n, D) per device over mesh axis "seq".
- Each of n ring steps attends the local queries to the K/V block that
  originated on device (idx - r) mod n, then `ppermute`s K/V to the next
  device. Accumulation is the online-softmax (flash) update in fp32, so
  the result is exact — not an approximation — while logits stay
  (S/n, S/n) per step instead of (S, S).
- Causality is positional: block j contributes to block i iff j <= i,
  with the diagonal block causally masked elementwise. Fully-future
  blocks still traverse the ring (SPMD programs can't skip data-dependent
  steps) but are where-masked to zero contribution.
- Gradients flow through `ppermute`/`scan` transposes, so the same code
  path serves training.

For the CSM parity workload (<=2048 frames) single-chip attention is
never the bottleneck; this exists so the framework scales past the
reference's hard cap.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csm_mlx_tpu.ops.attention import NEG_INF
from csm_mlx_tpu.parallel._compat import shard_map as _smap


def _ring_body(q: jax.Array, k0: jax.Array, v0: jax.Array, scale: float,
               axis: str, n: int) -> jax.Array:
    """Per-device ring attention. q: (B, H, Sl, D), k0/v0: (B, Hkv, Sl, D)
    local shards; returns the exact causal attention output (B, H, Sl, D)."""
    b, n_heads, s_loc, d = q.shape
    n_kv = k0.shape[1]
    group = n_heads // n_kv
    idx = jax.lax.axis_index(axis)

    qg = q.reshape(b, n_kv, group, s_loc, d).astype(jnp.float32)
    q_pos = idx * s_loc + jax.lax.iota(jnp.int32, s_loc)  # (Sl,)

    m0 = jnp.full((b, n_kv, group, s_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, n_kv, group, s_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, n_kv, group, s_loc, d), jnp.float32)

    def step(carry, r):
        k, v, m, l, acc = carry
        src = jax.lax.rem(idx - r + n, n)  # block origin at this tick
        k_pos = src * s_loc + jax.lax.iota(jnp.int32, s_loc)
        ok = k_pos[None, :] <= q_pos[:, None]  # (Sl_q, Sl_k)

        logits = jnp.einsum(
            "bkgqd,bkld->bkgql", qg, k.astype(jnp.float32),
            preferred_element_type=jnp.float32) * jnp.float32(scale)
        logits = jnp.where(ok[None, None, None], logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        # where-masked exp: if every key this tick is future, m_new == m
        # == NEG_INF and a bare exp(0)=1 would poison the accumulator.
        p = jnp.where(ok[None, None, None],
                      jnp.exp(logits - m_new), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bkgql,bkld->bkgqd", p, v.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        return (k, v, m_new, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k0, v0, m0, l0, acc0), jnp.arange(n))
    out = acc / jnp.maximum(l, jnp.float32(1e-30))
    return out.reshape(b, n_heads, s_loc, d).astype(q.dtype)


def ring_sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
              mesh: Mesh, axis: str = "seq") -> jax.Array:
    """Causal GQA attention with the sequence dim sharded over `axis`.

    Args:
      q: (B, n_heads, S, D) — mesh.shape[axis] must divide S.
      k, v: (B, n_kv, S, D).
      scale: softmax scale (head_dim ** -0.5 in the CSM stack).
      mesh: mesh containing `axis`; inputs may be unsharded (shard_map
        partitions them) or already laid out P(None, None, axis, None).

    Returns (B, n_heads, S, D), sharded over `axis` on dim 2. Exact
    (online-softmax) — matches `ops.attention.sdpa` with a causal mask.
    """
    n = mesh.shape[axis]
    if q.shape[2] % n != 0:
        raise ValueError(f"sequence {q.shape[2]} not divisible by "
                         f"{axis}={n}")
    return _build_ring(mesh, axis, n, float(scale))(q, k, v)


@lru_cache(maxsize=16)
def _build_ring(mesh: Mesh, axis: str, n: int, scale: float):
    """Cache the shard_map wrapper per (mesh, axis, scale): rebuilding the
    closure on every call would defeat jax's dispatch cache and re-trace
    each eager invocation."""
    spec = P(None, None, axis, None)
    return _smap(
        lambda ql, kl, vl: _ring_body(ql, kl, vl, scale, axis, n),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)


def shard_sequence(x: jax.Array, mesh: Mesh, axis: str = "seq",
                   dim: int = 2) -> jax.Array:
    """device_put with dim `dim` sharded over mesh axis `axis`."""
    spec = P(*(axis if i == dim else None for i in range(x.ndim)))
    return jax.device_put(x, NamedSharding(mesh, spec))
