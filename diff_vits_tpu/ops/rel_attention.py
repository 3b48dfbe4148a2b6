"""Pallas TPU fused relative-position self-attention.

One kernel for the whole VITS-encoder attention step
(attentions.py:142-296 semantics, window rel K/V with heads_share): q/k/v
projections, scores, windowed relative-key logits, mask, softmax, value
matmul, windowed relative-value contribution, and the output projection.

The XLA formulation (nn/layers.py:MultiHeadAttention) materializes
[B, H, T, 2T-1] relative-logit tensors and runs pad/reshape index shuffles
(_rel_to_abs/_abs_to_rel) plus a [T, 2T-1, d] matmul against a table that
is zero outside the +-window band. This kernel computes the band
contribution directly: a [T, 2w+1, d]-sized matmul and 2w+1 unrolled
masked diagonal adds — O(T*w*d) instead of O(T^2*d) relative work, and no
relayouts.

The relative table semantics reduce to: scores[t, s] += q[t] . emb_k[s-t+w]
for |s-t| <= w (zero outside), and out[t] += sum_m p[t, t+m-w] emb_v[m] —
including the reference's short-sequence (T <= w) slicing, which maps to
the same emb[r+w] indexing (see _get_relative_embeddings).

Inference-only (the training path keeps the autodiff-friendly XLA
formulation), heads_share=True, self-attention, no proximal bias / block
masking — the production TextEncoder configuration (config.json:52-58).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, ek_ref, ev_ref, o_ref, *, heads: int,
            window: int, cdt):
    x = x_ref[0]
    t = x.shape[0]
    q = jnp.dot(x.astype(cdt), wq_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bq_ref[:][None]
    k = jnp.dot(x.astype(cdt), wk_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bk_ref[:][None]
    v = jnp.dot(x.astype(cdt), wv_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + bv_ref[:][None]
    d = q.shape[-1] // heads
    scale = d ** -0.5
    ek = ek_ref[0].astype(cdt)            # [2w+1, d] shared across heads
    ev = ev_ref[0].astype(jnp.float32)
    mask = mask_ref[0]                    # [T, T] 1=keep

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    rel = s_idx - t_idx                   # in [-(T-1), T-1]

    outs = []
    for h in range(heads):
        qh = (q[:, h * d:(h + 1) * d] * scale).astype(cdt)
        kh = k[:, h * d:(h + 1) * d].astype(cdt)
        vh = v[:, h * d:(h + 1) * d].astype(cdt)
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # windowed relative-key logits: [T, 2w+1] then banded diagonal adds
        ql = jax.lax.dot_general(
            qh, ek, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for m in range(2 * window + 1):
            scores = scores + jnp.where(rel == m - window,
                                        ql[:, m][:, None], 0.0)
        scores = jnp.where(mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1)
        oh = jnp.dot(p.astype(cdt), vh, preferred_element_type=jnp.float32)
        # windowed relative-value: pl[t, m] = p[t, t+m-w]
        for m in range(2 * window + 1):
            pm = jnp.sum(jnp.where(rel == m - window, p, 0.0), axis=1)
            oh = oh + pm[:, None] * ev[m][None, :]
        outs.append(oh)
    attn = jnp.concatenate(outs, axis=-1)
    out = jnp.dot(attn.astype(cdt), wo_ref[:].astype(cdt),
                  preferred_element_type=jnp.float32) + bo_ref[:][None]
    o_ref[0] = out.astype(o_ref.dtype)


def fused_rel_self_attention(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                             emb_rel_k, emb_rel_v, *, heads: int,
                             window: int, compute_dtype=jnp.bfloat16,
                             interpret: Optional[bool] = None):
    """Full rel-pos MHA in one kernel.

    x: [B, T, C]; mask: [B, T, T] (1=keep, 0=masked, may be broadcast from
    [B, 1, T]); emb_rel_k/v: [1, 2w+1, d] (heads_share). Returns [B, T, Co].
    """
    b, t, c = x.shape
    co = wo.shape[1]
    if interpret is None:
        interpret = _use_interpret()
    if mask is None:
        mask = jnp.ones((b, t, t), jnp.float32)
    else:
        mask = jnp.broadcast_to(mask.astype(jnp.float32), (b, t, t))

    def full(shape):
        return pl.BlockSpec(shape, lambda bb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def batched(shape):
        return pl.BlockSpec((1,) + shape, lambda bb: (bb,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, heads=heads, window=window,
                               cdt=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[batched((t, c)), batched((t, t)),
                  full(wq.shape), full(bq.shape), full(wk.shape),
                  full(bk.shape), full(wv.shape), full(bv.shape),
                  full(wo.shape), full(bo.shape),
                  full(emb_rel_k.shape), full(emb_rel_v.shape)],
        out_specs=batched((t, co)),
        out_shape=jax.ShapeDtypeStruct((b, t, co), x.dtype),
        interpret=interpret,
    )(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, emb_rel_k, emb_rel_v)
