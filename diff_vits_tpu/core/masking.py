"""Mask / path / sequence utilities as pure jnp functions.

Capability parity with the reference's ``commons.py`` (commons.py:18-161) but
designed for XLA: static shapes, no boolean fancy-indexing, channel-last
``[B, T, C]`` layout.
"""
from __future__ import annotations

import math
from typing import List, Sequence, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Boolean mask [B, T]: True for positions < length.

    Parity: commons.py:121 (``sequence_mask``). ``max_length`` must be static
    under jit (pass the padded axis size).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def generate_path(duration: jax.Array, mask: jax.Array) -> jax.Array:
    """Expand integer durations into a hard monotonic alignment path.

    Args:
      duration: [B, Tx] (per-token frame counts).
      mask: [B, Ty, Tx] attention mask (y_mask x x_mask outer product).

    Returns:
      path: [B, Ty, Tx] with path[b, y, x] = 1 iff frame y belongs to token x.

    Parity: commons.py:128 (``generate_path``), returned transposed to
    [B, Ty, Tx] so it can be used directly as ``path @ token_features``.
    """
    b, t_y, t_x = mask.shape
    cum = jnp.cumsum(duration, axis=-1)  # [B, Tx]
    frame = jnp.arange(t_y, dtype=cum.dtype)  # [Ty]
    # below[b, y, x] = (y < cum[b, x]); path = below[x] and not below[x-1]
    below = frame[None, :, None] < cum[:, None, :]
    below_prev = jnp.pad(below[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    path = below & ~below_prev
    return path.astype(mask.dtype) * mask


def intersperse(lst: Sequence[T], item: T) -> List[T]:
    """Insert `item` between (and around) every element. commons.py:24."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = list(lst)
    return result


def convert_pad_shape(pad_shape: Sequence[Sequence[int]]) -> List[int]:
    """Torch-order pad helper kept for API familiarity. commons.py:18."""
    return [item for sublist in pad_shape[::-1] for item in sublist]


def kl_divergence(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) between diagonal Gaussians. commons.py:30."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Masked mean KL used as the VITS prior loss.

    All tensors are [B, T, C] (channel-last); z_mask is [B, T, 1].
    Parity: losses.py:46 (``kl_loss``).
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)

    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time slices per batch element.

    x: [B, T, C]; ids_str: [B]. Parity: commons.py:48 — implemented with
    dynamic_slice (XLA-friendly) instead of a python loop.
    """

    def one(xb, i):
        return jax.lax.dynamic_slice_in_dim(xb, i, segment_size, axis=0)

    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(x, lengths, segment_size, key):
    """Random fixed-size slices (commons.py:57)."""
    b = x.shape[0]
    ids_str_max = jnp.maximum(lengths - segment_size + 1, 1)
    u = jax.random.uniform(key, (b,))
    ids_str = (u * ids_str_max).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def subsequent_mask(length: int) -> jax.Array:
    """Lower-triangular causal mask [1, 1, T, T]. commons.py:95."""
    return jnp.tril(jnp.ones((length, length)))[None, None]


def get_timing_signal_1d(length: int, channels: int,
                         min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jax.Array:
    """Sinusoidal timing signal [1, T, C] (channel-last). commons.py:67."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = math.log(max_timescale / min_timescale) / max(
        num_timescales - 1, 1)
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_timescale_increment)
    scaled_time = position[:, None] * inv_timescales[None, :]
    signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)
    signal = jnp.pad(signal, ((0, 0), (0, channels % 2)))
    return signal[None]
