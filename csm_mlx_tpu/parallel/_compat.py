"""JAX version shims shared by the parallel modules."""

from __future__ import annotations

try:  # jax>=0.6 exports shard_map at top level (check_rep → check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep", False)
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401
