"""Scaled-dot-product attention helpers.

Capability parity with the reference's ``attend.py`` (Attend, a flash-SDPA
wrapper imported from naturalspeech2-pytorch but unused by the active path,
SURVEY.md §2.1). On TPU, XLA already fuses the softmax-attention chain onto
the MXU; this module provides the shared functional form the nn/ modules
build on, plus a causal/key-padding interface mirroring ``Attend``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """SDPA over [B, H, T, D] tensors.

    mask: boolean keep-mask broadcastable to [B, H, Tq, Tk].
    bias: additive bias broadcastable to scores.
    Parity: attend.py:77-126 (flash_attn/forward semantics).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)
    if bias is not None:
        scores = scores + bias
    if causal:
        t_q, t_k = scores.shape[-2], scores.shape[-1]
        causal_mask = jnp.tril(jnp.ones((t_q, t_k), bool), t_k - t_q)
        scores = jnp.where(causal_mask[None, None], scores, -jnp.inf)
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    # rows that are fully masked produce NaN; zero them (torch SDPA returns 0)
    if mask is not None or causal:
        p = jnp.where(jnp.isnan(p), 0.0, p)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def attend(q, k, v, key_padding_mask=None, causal=False):
    """``Attend``-shaped entry (attend.py:35): q/k/v [B, H, T, D]; a boolean
    key-padding keep-mask [B, Tk]."""
    mask = None
    if key_padding_mask is not None:
        mask = key_padding_mask[:, None, None, :]
    return scaled_dot_product_attention(q, k, v, mask=mask, causal=causal)
