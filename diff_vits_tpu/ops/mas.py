"""Monotonic Alignment Search as an on-device vectorized scan.

The reference escapes to a numba CPU kernel with a full GPU->CPU->GPU round
trip per training step (monotonic_align/__init__.py:6-15, core.py:4-35). Here
the Viterbi forward pass is a single ``lax.scan`` over mel frames with the
per-frame band fully vectorized over (batch, text) on the VPU, and the
backtrack is a reverse scan — everything stays inside jit, so MAS fuses into
the training step with no host sync.

Semantics match the numba kernel exactly, including its edge rules:
  * value[y, x] += max(v_prev, v_cur)
  * v_cur  = value[y-1, x]   unless x == y        (then -1e9)
  * v_prev = value[y-1, x-1] unless x == 0        (then 0 if y==0 else -1e9)
  * per-sample band x in [max(0, t_x + y - t_y), min(t_x, y + 1))
  * backtrack from index = t_x - 1, moving left when
    ``index == y or value[y-1, index] < value[y-1, index-1]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


def _forward_values(neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Run the Viterbi forward DP. Returns accumulated values [B, Ty, Tx]."""
    b, t_y_max, t_x_max = neg_cent.shape
    x_idx = jnp.arange(t_x_max, dtype=jnp.int32)[None, :]  # [1, Tx]
    t_xs_ = t_xs[:, None].astype(jnp.int32)
    t_ys_ = t_ys[:, None].astype(jnp.int32)

    def step(prev_row, inputs):
        # prev_row: [B, Tx] accumulated values of row y-1
        y, row_raw = inputs  # row_raw: [B, Tx]
        v_cur = jnp.where(x_idx == y, _NEG, prev_row)
        shifted = jnp.pad(prev_row[:, :-1], ((0, 0), (1, 0)))
        v_prev = jnp.where(x_idx == 0,
                           jnp.where(y == 0, 0.0, _NEG),
                           shifted)
        acc = row_raw + jnp.maximum(v_cur, v_prev)
        lower = jnp.maximum(0, t_xs_ + y - t_ys_)
        upper = jnp.minimum(t_xs_, y + 1)
        in_band = (x_idx >= lower) & (x_idx < upper)
        row = jnp.where(in_band, acc, row_raw)
        return row, row

    ys = jnp.arange(t_y_max, dtype=jnp.int32)
    rows = jnp.moveaxis(neg_cent, 1, 0)  # [Ty, B, Tx]
    _, values = jax.lax.scan(step, jnp.zeros((b, t_x_max), neg_cent.dtype), (ys, rows))
    return jnp.moveaxis(values, 0, 1)  # [B, Ty, Tx]


def _backtrack(values: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """Walk the argmax path backwards. Returns hard path [B, Ty, Tx]."""
    b, t_y_max, t_x_max = values.shape
    t_xs_ = t_xs.astype(jnp.int32)
    t_ys_ = t_ys.astype(jnp.int32)
    x_idx = jnp.arange(t_x_max, dtype=jnp.int32)[None, :]

    def step(index, inputs):
        # index: [B] current text position; scanning y from Ty-1 down to 0
        y, row_prev = inputs  # row_prev = values[:, y-1, :] (junk at y=0)
        active = y < t_ys_  # [B]
        path_row = jnp.where(active[:, None] & (x_idx == index[:, None]), 1.0, 0.0)
        v_at = jnp.take_along_axis(row_prev, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            row_prev, jnp.maximum(index - 1, 0)[:, None], axis=1)[:, 0]
        move = (index != 0) & ((index == y) | (v_at < v_left))
        new_index = jnp.where(active & move, index - 1, index)
        return new_index, path_row

    ys = jnp.arange(t_y_max - 1, -1, -1, dtype=jnp.int32)
    rows_prev = jnp.moveaxis(values, 1, 0)  # [Ty, B, Tx]; row y-1 for each y
    rows_prev = rows_prev[jnp.maximum(ys - 1, 0)]
    _, path_rows = jax.lax.scan(step, t_xs_ - 1, (ys, rows_prev))
    path = jnp.moveaxis(path_rows[::-1], 0, 1)  # [B, Ty, Tx]
    return path


@functools.partial(jax.jit, static_argnames=())
def maximum_path(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """Monotonic alignment search.

    Args:
      neg_cent: [B, Ty, Tx] negative cross-entropy scores (mel frames x text).
      mask: [B, Ty, Tx] attention mask (outer product of the two masks).

    Returns:
      Hard alignment path [B, Ty, Tx], same dtype as ``neg_cent``.

    Parity: monotonic_align/__init__.py:6 (``maximum_path``); lengths are
    derived from the mask exactly as the reference does (sum over each axis).
    """
    dtype = neg_cent.dtype
    nc = neg_cent.astype(jnp.float32)
    t_ys = mask.sum(axis=1)[:, 0].astype(jnp.int32)  # mel lengths
    t_xs = mask.sum(axis=2)[:, 0].astype(jnp.int32)  # text lengths
    values = _forward_values(nc, t_ys, t_xs)
    path = _backtrack(values, t_ys, t_xs)
    return (path * mask.astype(jnp.float32)).astype(dtype)
