"""Static-shape KV cache.

The reference relies on mlx_lm's dynamically growing KVCache
(`/root/reference/csm_mlx/generation.py:127`, `attention.py:237`). Dynamic
shapes defeat XLA's trace-once compilation model, so the TPU-native cache is
pre-allocated at a fixed capacity and updated in place with
`lax.dynamic_update_slice` — one compile, zero reallocation, and the whole
decode loop stays on-device.

The cache is a pytree (registered dataclass) so it threads through
`jax.jit` / `lax.while_loop` / `lax.scan` carries and can be sharded with
`jax.sharding` like any other array.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from csm_mlx_tpu.config import LlamaConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-layer stack of keys/values with a shared write index.

    k, v: (num_layers, B, n_kv_heads, capacity, head_dim)
    index: () int32 — number of tokens already written (= next write slot).
    """

    k: jax.Array
    v: jax.Array
    index: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def init(
        cfg: LlamaConfig,
        batch_size: int,
        capacity: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (
            cfg.num_hidden_layers,
            batch_size,
            cfg.num_key_value_heads,
            capacity,
            cfg.head_dim,
        )
        return KVCache(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            index=jnp.zeros((), dtype=jnp.int32),
        )

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array
    ) -> Tuple["KVCache", jax.Array, jax.Array]:
        """Write S new tokens for `layer` at `self.index`; return full k/v.

        k_new/v_new: (B, n_kv, S, head_dim). The index is only advanced by
        `advance()` once all layers have written (they share one position).

        CONTRACT: index + S must not exceed the cache capacity.
        `dynamic_update_slice` CLAMPS an out-of-range start instead of
        failing, so an overflowing write lands on the last valid slots and
        silently overwrites the newest real K/V (attention then mixes old
        and new tokens with no error). Callers size capacity up front
        (prompt bucket + max frames; see generation/continuous) — keep
        doing that.
        """
        # Single dynamic-update-slice into the 5-D buffer: XLA performs this
        # in place when the cache is a loop carry, so a decode step costs
        # O(S) writes, not a cache copy.
        start = (layer, 0, 0, self.index, 0)
        k5 = jax.lax.dynamic_update_slice(self.k, k_new[None].astype(self.k.dtype), start)
        v5 = jax.lax.dynamic_update_slice(self.v, v_new[None].astype(self.v.dtype), start)
        new = dataclasses.replace(self, k=k5, v=v5)
        return new, k5[layer], v5[layer]

    def advance(self, n_tokens: int | jax.Array) -> "KVCache":
        return dataclasses.replace(self, index=self.index + jnp.asarray(n_tokens, jnp.int32))

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TieredKVCache:
    """Block-decode view of a KVCache: invariant big tier + tiny carry tier.

    A KVCache threaded as a scan carry serializes XLA's pipelining — the
    decode attention's big K/V reads cannot be prefetched across
    iterations because the buffer changes every step, and the measured
    read rate drops 553 -> 214 GB/s at B=48 (benchmarks/micro_kv_carry.py;
    splitting the stacked buffer per layer does NOT help). For a K-frame
    step BLOCK (continuous.py), only the K newest positions actually
    change: this view keeps the big buffers out of the carry (they are
    invariant for the whole block program) and carries only an
    (L, B, n_kv, K, hd) recent tier. Attention runs over both tiers with
    one softmax (ops/attention.py::tiered_sdpa); `merge()` splices the
    recent tier into the big buffer once per block. Measured: 4.70 ->
    3.01 ms/step at B=48 x cap 640.

    big_k/big_v: the KVCache buffers — positions [0, base) are live.
    rk/rv: the block's recent tier — positions [base, base + j] live,
      j = index - base.
    base: () int32 — the big tier's write position at block entry.
    index: () int32 — the current global write position.
    """

    big_k: jax.Array
    big_v: jax.Array
    rk: jax.Array
    rv: jax.Array
    base: jax.Array
    index: jax.Array

    @property
    def capacity(self) -> int:
        return self.big_k.shape[3]

    @property
    def window(self) -> int:
        return self.rk.shape[3]

    @staticmethod
    def wrap(cache: KVCache, window: int) -> "TieredKVCache":
        """Start a block: empty recent tier over the cache's buffers."""
        l, b, h, _cap, d = cache.k.shape
        z = jnp.zeros((l, b, h, window, d), cache.k.dtype)
        return TieredKVCache(big_k=cache.k, big_v=cache.v, rk=z, rv=z,
                             base=cache.index, index=cache.index)

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array
    ) -> Tuple["TieredKVCache", Tuple[jax.Array, jax.Array],
               Tuple[jax.Array, jax.Array]]:
        """Write S=1 new tokens into the RECENT tier at j = index - base.

        Returns (cache', (big_k[layer], rk[layer]), (big_v[layer],
        rv[layer])) — the tuple k/v signals _attn_layer to take the
        tiered-attention path.
        """
        j = self.index - self.base
        start = (layer, 0, 0, j, 0)
        rk = jax.lax.dynamic_update_slice(
            self.rk, k_new[None].astype(self.rk.dtype), start)
        rv = jax.lax.dynamic_update_slice(
            self.rv, v_new[None].astype(self.rv.dtype), start)
        new = dataclasses.replace(self, rk=rk, rv=rv)
        return new, (self.big_k[layer], rk[layer]), \
            (self.big_v[layer], rv[layer])

    def advance(self, n_tokens: int | jax.Array) -> "TieredKVCache":
        return dataclasses.replace(
            self, index=self.index + jnp.asarray(n_tokens, jnp.int32))

    def merge(self) -> KVCache:
        """End a block: splice the recent tier into the big buffers."""
        start = (0, 0, 0, self.base, 0)
        k5 = jax.lax.dynamic_update_slice(
            self.big_k, self.rk.astype(self.big_k.dtype), start)
        v5 = jax.lax.dynamic_update_slice(
            self.big_v, self.rv.astype(self.big_v.dtype), start)
        return KVCache(k=k5, v=v5, index=self.index)

def use_tiered_kv(block_frames: int) -> bool:
    """Gate for tiered block decode (TieredKVCache): threading only a
    K-position recent KV tier through a decode scan keeps the big cache
    buffers scan-invariant so XLA pipelines their reads (4.70 -> 3.01
    ms/step at B=48 x cap 640 — benchmarks/micro_kv_carry.py). TPU
    default; off elsewhere so CPU tests keep bit-exact parity with the
    classic per-frame path (the tiered softmax differs in reduction order
    only) — CSM_TPU_TIERED_KV=force/0 overrides."""
    import os

    flag = os.environ.get("CSM_TPU_TIERED_KV", "1")
    if flag == "0" or block_frames <= 1:
        return False
    return flag == "force" or jax.default_backend() == "tpu"
