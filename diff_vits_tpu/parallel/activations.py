"""Sequence-parallel activation sharding (GSPMD spatial partitioning).

The reference caps sequence length by dataset cropping and runs every
attention fully on one device (SURVEY.md §5.7). Beyond the explicit ring
attention in ``parallel/ring_attention.py``, this module supplies the
*compiler-driven* sequence-parallel path: when a mesh with a ``seq`` axis is
activated, `[B, T, C]` activations inside the hot modules (the diffusion
UNet) are constrained to ``P(data, seq, None)`` and GSPMD partitions the
whole program around them — convolutions get halo exchanges, attention
score matrices are computed blockwise per shard, and the collectives ride
the ICI ring. No module code changes per topology: the constraint is a
no-op unless a mesh with a >1 ``seq`` axis has been activated.

Usage::

    with activations.sequence_parallel(mesh):      # mesh has a 'seq' axis
        step = jax.jit(train_step, in_shardings=..., ...)
        state, metrics = step(state, batch)        # traced under the scope

The scope only needs to cover *tracing*; the constraint is baked into the
jaxpr.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def _current():
    return getattr(_state, "cfg", None)


def enable_sequence_parallel(mesh: Mesh, data_axis: str = "data",
                             seq_axis: str = "seq") -> None:
    """Activate [B, T, C] activation sharding for subsequent traces."""
    if seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{seq_axis}' axis: {mesh.axis_names}")
    _state.cfg = (mesh, data_axis if data_axis in mesh.axis_names else None,
                  seq_axis)


def disable_sequence_parallel() -> None:
    _state.cfg = None


@contextlib.contextmanager
def sequence_parallel(mesh: Optional[Mesh], data_axis: str = "data",
                      seq_axis: str = "seq"):
    """Scoped activation; pass mesh=None for a no-op scope."""
    prev = _current()
    if mesh is not None:
        enable_sequence_parallel(mesh, data_axis, seq_axis)
    else:
        _state.cfg = None
    try:
        yield
    finally:
        _state.cfg = prev


def constrain_seq(x):
    """Constrain a [B, T, ...] activation to (data, seq, ...) sharding.

    No-op unless a sequence-parallel scope is active and the seq axis has
    more than one device. Safe to call inside jit: the constraint is a
    GSPMD annotation, not a reshard at trace time.
    """
    cfg = _current()
    if cfg is None or getattr(x, "ndim", 0) < 2:
        return x
    mesh, data_axis, seq_axis = cfg
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if sizes.get(seq_axis, 1) <= 1:
        return x
    spec = P(data_axis, seq_axis, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
