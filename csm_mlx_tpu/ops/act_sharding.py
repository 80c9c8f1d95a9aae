"""Activation sharding constraints for TP x DP jit programs.

`parallel.mesh` shards the *parameters*; without activation annotations the
GSPMD partitioner has to guess intermediate shardings inside
jit(train_step), and on the attention softmax it guesses itself into
"Involuntary full rematerialization" warnings — activations bouncing
between batch-sharded and head-sharded layouts with full replication in
between. The model code calls `constrain(x, ...)` at the layer boundaries
with *logical* axis names ("data", "model"); this module resolves them
against the mesh installed by `activation_sharding(mesh)` (a trace-time
context the trainer / dryrun wraps around the loss). With no context
installed every call is a zero-cost identity, so single-device paths are
untouched.

Axes that are absent from the mesh, or whose dimension does not divide the
mesh axis, resolve to None (replicated) — the same forgiving rule as
`parallel.mesh.shard_params`.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax

_CTX: dict = {"mesh": None, "data": "data", "model": "model"}


@contextmanager
def activation_sharding(mesh, data: str = "data", model: str = "model"):
    """Install `mesh` for `constrain()` calls traced inside this scope.

    `data`/`model` rename the logical axes to the mesh's actual axis names
    (e.g. activation_sharding(mesh, data="batch"))."""
    prev = dict(_CTX)
    _CTX.update(mesh=mesh, data=data, model=model)
    try:
        yield
    finally:
        _CTX.update(prev)


def active_mesh():
    return _CTX["mesh"]


def active_axis_names():
    """(data_axis_name, model_axis_name) under the installed context —
    the logical names may be renamed per-mesh via activation_sharding()."""
    return _CTX["data"], _CTX["model"]


def sharding_ctx(mesh):
    """`activation_sharding(mesh)`, or a no-op context when mesh is None —
    the one-liner generation/serving call sites wrap their jit dispatches
    in (the context matters only while a program TRACES; wrapping every
    dispatch is harmless and keeps the call sites oblivious to jit's cache
    state)."""
    if mesh is None:
        from contextlib import nullcontext

        return nullcontext()
    return activation_sharding(mesh)


def constrain(x: jax.Array, *axes: Optional[str]) -> jax.Array:
    """with_sharding_constraint(x, P(*axes)) under the installed mesh.

    `axes` are logical names per dimension: "data", "model", or None.
    Identity when no mesh is installed; non-dividing or mesh-absent axes
    fall back to None for that dim.
    """
    mesh = _CTX["mesh"]
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    sizes = dict(mesh.shape)
    spec = []
    for dim, a in enumerate(axes):
        name = _CTX.get(a, a) if a in ("data", "model") else a
        if (name is None or name not in sizes
                or x.shape[dim] % sizes[name] != 0):
            spec.append(None)
        else:
            spec.append(name)
    if x.ndim > len(spec):
        spec.extend([None] * (x.ndim - len(spec)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
