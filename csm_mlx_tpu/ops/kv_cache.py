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
