"""Flash-attention routing for SDPA-style attention on TPU.

The XLA einsum formulation materializes the [B, H, T, S] score matrix in
HBM four times per attention site (scores write, softmax read + write,
PV read). At training shapes that is the UNets' largest single HBM cost:
e.g. the duration-predictor UNet's T=601 self-attention moves ~740 MB per
site at batch 32. The fused kernel (jax.experimental's Pallas TPU flash
attention, forward AND backward) keeps score blocks in VMEM.

Parity targets: diffusers ``AttnProcessor2_0`` semantics
(/root/reference/unet1d/attention_processor.py:971 — SDPA with additive
-10000 key-padding bias, unet_1d_condition.py:807-818). A -10000 bias and
the kernel's hard segment mask agree to fp32 precision (exp(-10000) == 0).

Routing (``fused_gate`` convention, like the other Pallas kernels):
``DIFF_VITS_FLASH_ATTENTION`` / ``DIFF_VITS_FUSED`` env vars or
``use_flash=`` per call; **default OFF — measured slower on this model**.
On-chip A/B at the production attention shapes (v5e, b=32, bf16):

    site                      fwd flash/xla      grad flash/xla   max err
    dp-UNet self T=601 d=8    3.38 / 0.89 ms     12.24 / 3.48 ms  0.012
    diff-UNet self T=400 d=64 2.33 / 0.44 ms      7.86 / 1.74 ms  0.008
    cross T=400 S=267 d=16    1.65 / 0.22 ms      6.78 / 0.46 ms  0.012
    EncSA self T=400 d=32     2.18 / 0.25 ms      7.86 / 0.80 ms  0.008

The architecture's head_dims (8-64) fill at most half of the kernel's
128-wide MXU blocks while XLA's einsum path stays fast at these sizes, so
the kernel's VMEM-residency win never materializes. The route is kept as
working, parity-tested infrastructure for long-sequence / wide-head
variants where the score matrix genuinely dominates. The XLA path is
always taken off-TPU, for tiny sequences, and for head_dim > 128.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from diff_vits_tpu.ops import fused_gate

_BLOCK = 128  # MIN_BLOCK_SIZE of the TPU kernel; all seqs pad to this


def _pad_len(n: int) -> int:
    return -(-n // _BLOCK) * _BLOCK


def xla_sdpa(q, k, v, kv_mask=None, *, sm_scale: float):
    """Reference formulation: einsum scores + softmax + PV (HBM scores)."""
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) * sm_scale
    if kv_mask is not None:
        bias = jnp.where(kv_mask[:, None, None, :], 0.0, -10000.0)
        scores = scores + bias.astype(scores.dtype)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def flash_ok(q_shape, k_shape, use_flash="auto") -> bool:
    """Shape/backend eligibility for the fused kernel."""
    # default OFF: measured slower than XLA at every production shape of
    # this model (see module docstring A/B table) — opt in per call or via
    # DIFF_VITS_FLASH_ATTENTION for long-sequence/wide-head variants
    if not fused_gate("DIFF_VITS_FLASH_ATTENTION", use_flash,
                      default=False):
        return False
    if jax.default_backend() != "tpu":
        return False
    b, h, t, d = q_shape
    s = k_shape[2]
    if d > 128:
        return False
    # tiny sites: kernel launch + padding beats nothing (scores fit VMEM
    # and XLA fuses well); threshold from the score-matrix HBM cost
    if t * s < 128 * 128 * 4:
        return False
    return True


def sdpa(q, k, v, kv_mask=None, *, sm_scale: float, use_flash="auto"):
    """Scaled-dot-product attention, flash-fused on TPU.

    q: [B, H, T, d]; k/v: [B, H, S, d]; kv_mask: bool [B, S] (True = keep)
    or None. Returns [B, H, T, d]. Differentiable on both routes (the
    kernel ships its own backward kernels).
    """
    if not flash_ok(q.shape, k.shape, use_flash):
        return xla_sdpa(q, k, v, kv_mask, sm_scale=sm_scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, t, d = q.shape
    s = k.shape[2]
    tp, sp = _pad_len(t), _pad_len(s)
    in_dtype = q.dtype
    # the kernel computes fp32 partials; bf16 inputs are fine
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sp - s), (0, 0)))

    if kv_mask is None:
        kv_seg = jnp.ones((b, sp), jnp.int32).at[:, s:].set(0) \
            if sp != s else jnp.ones((b, sp), jnp.int32)
    else:
        kv_seg = jnp.pad(kv_mask.astype(jnp.int32),
                         ((0, 0), (0, sp - s)))
    q_seg = jnp.ones((b, tp), jnp.int32)
    segs = fa.SegmentIds(q=q_seg, kv=kv_seg)

    block = fa.BlockSizes(
        block_q=min(_BLOCK, tp), block_k_major=min(_BLOCK, sp),
        block_k=min(_BLOCK, sp), block_b=1,
        block_q_major_dkv=min(_BLOCK, tp), block_k_major_dkv=min(_BLOCK, sp),
        block_k_dkv=min(_BLOCK, sp), block_q_dkv=min(_BLOCK, tp),
        block_k_major_dq=min(_BLOCK, sp), block_k_dq=min(_BLOCK, sp),
        block_q_dq=min(_BLOCK, tp))
    out = fa.flash_attention(qp, kp, vp, segment_ids=segs,
                             sm_scale=sm_scale, block_sizes=block)
    return out[:, :, :t].astype(in_dtype)


def bias_to_keep_mask(attention_bias) -> Optional[jax.Array]:
    """[B, X, S] additive 0/-10000 bias -> bool [B, S] keep mask.

    The UNet builds key-padding biases only (broadcast over queries,
    unet_1d_condition.py:807-818), so row 0 carries the full information.
    """
    if attention_bias is None:
        return None
    return attention_bias[:, 0, :] > -5000.0
