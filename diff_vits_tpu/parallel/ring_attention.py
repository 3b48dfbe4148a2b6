"""Ring (sequence-parallel) attention over a mesh axis.

The reference has no long-context machinery (SURVEY.md §5.7): every
attention is full O(T^2) on one device and sequence length is capped by
dataset cropping. This module supplies the TPU-native scaling path: shard
the sequence axis of q/k/v over a mesh axis, keep q resident, and rotate
k/v blocks around the ring with ``lax.ppermute`` while accumulating the
softmax online (flash-attention style), so no device ever materializes the
full [T, T] score matrix and the k/v traffic rides the ICI ring.

Use ``ring_attention(...)`` inside ``shard_map`` (see
``make_ring_attention`` for a ready-made wrapper), with q/k/v sharded on
their sequence axis over ``axis_name``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, keep, scale, m, l, o):
    """One online-softmax accumulation step.

    q [B,H,Tq,D]; k/v [B,H,Tk,D]; keep [B,Tk] bool or None;
    (m, l, o) running (max, denominator, unnormalized output).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if keep is not None:
        s = jnp.where(keep[:, None, None, :], s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # -inf rows (fully masked so far) must not poison the rescale
    m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    alpha = jnp.exp(jnp.where(jnp.isneginf(m), -jnp.inf, m - m_safe))
    p = jnp.exp(s - m_safe[..., None])
    if keep is not None:
        p = jnp.where(keep[:, None, None, :], p, 0.0)
    l_new = l * alpha + jnp.sum(p, axis=-1)
    o_new = o * alpha[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return m_new, l_new, o_new


def ring_attention(q, k, v, keep_mask=None, *, axis_name: str,
                   scale: Optional[float] = None):
    """Sequence-parallel attention body (call inside shard_map).

    q [B,H,Tq_local,D], k/v [B,H,Tk_local,D] are the local sequence shards;
    keep_mask [B,Tk_local] marks valid key positions of the local shard.
    Returns the attention output for the local q block, identical (up to
    float error) to full softmax attention over the gathered sequence.
    """
    n = jax.lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    b, h, tq, d = q.shape
    m = jnp.full((b, h, tq), -jnp.inf, q.dtype)
    l = jnp.zeros((b, h, tq), q.dtype)
    o = jnp.zeros((b, h, tq, d), q.dtype)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, _):
        k_cur, v_cur, keep_cur, m, l, o = carry
        m, l, o = _block_attend(q, k_cur, v_cur, keep_cur, scale, m, l, o)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        if keep_cur is not None:
            keep_cur = jax.lax.ppermute(keep_cur, axis_name, perm)
        return (k_cur, v_cur, keep_cur, m, l, o), None

    # lax.scan (not fori_loop): scan has a reverse-mode rule, so the ring
    # is trainable — the backward pass re-rotates k/v cotangents with the
    # transposed ppermute automatically
    (_, _, _, m, l, o), _ = jax.lax.scan(
        body, (k, v, keep_mask, m, l, o), None, length=n)
    return o / jnp.maximum(l, 1e-30)[..., None]


def make_ring_attention(mesh: Mesh, axis_name: str = "seq"):
    """jit-able f(q, k, v, keep_mask) with q/k/v [B,H,T,D] sharded on T over
    ``axis_name`` (batch replicated; shard batch over 'data' outside)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_qkv = P(None, None, axis_name, None)
    spec_mask = P(None, axis_name)

    import inspect
    kwargs = {}
    # jax.shard_map dropped check_rep; the experimental one requires it off
    sig = inspect.signature(shard_map).parameters
    if "check_rep" in sig:
        kwargs["check_rep"] = False
    elif "check_vma" in sig:  # jax >= 0.9 renamed the replication check
        kwargs["check_vma"] = False

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
             out_specs=spec_qkv, **kwargs)
    def fn(q, k, v, keep_mask):
        return ring_attention(q, k, v, keep_mask, axis_name=axis_name)

    return fn
