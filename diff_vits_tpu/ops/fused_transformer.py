"""Pallas TPU fused kernels for the UNet transformer blocks.

The denoiser's inference profile is op-count-bound, not FLOP-bound: one UNet
step issues ~2500 device ops of ~1 us each (profiled on v5e; see
docs/DESIGN.md), with 16 transformer blocks contributing most of them. Each
fused kernel below collapses a whole sub-block — LayerNorm + projections +
multi-head attention + out-projection + residual, or LayerNorm + GEGLU MLP +
residual — into a single Pallas program, removing the per-op sequencing
overhead and all HBM round-trips between the fused ops.

Parity targets: diffusers ``Attention``/``AttnProcessor2_0``
(attention_processor.py:26,971 — SDPA semantics, additive -10000 bias) and
``FeedForward``/``GEGLU`` (attention.py:206,280 — exact-tanh-free gelu).

Shapes are small (T <= ~512, C <= 512), so each grid program holds a full
[T, C] tile in VMEM; the feed-forward tiles T to bound its [T, 8C]
intermediate. Kernels are inference-only (the training path keeps the
autodiff-friendly XLA formulation).
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


def _layer_norm_f32(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _mha(h_q, src, wq, wk, wv, wo, bo, bias, heads: int, cdt):
    """Multi-head SDPA on [T, C] inputs, all in VMEM, fp32 accumulation."""
    q = jnp.dot(h_q.astype(cdt), wq.astype(cdt),
                preferred_element_type=jnp.float32)
    k = jnp.dot(src.astype(cdt), wk.astype(cdt),
                preferred_element_type=jnp.float32)
    v = jnp.dot(src.astype(cdt), wv.astype(cdt),
                preferred_element_type=jnp.float32)
    inner = q.shape[-1]
    d = inner // heads
    scale = d ** -0.5
    outs = []
    for i in range(heads):
        qh = q[:, i * d:(i + 1) * d].astype(cdt)
        kh = k[:, i * d:(i + 1) * d].astype(cdt)
        vh = v[:, i * d:(i + 1) * d].astype(cdt)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.dot(p.astype(cdt), vh,
                            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)
    return jnp.dot(attn.astype(cdt), wo.astype(cdt),
                   preferred_element_type=jnp.float32) + bo[None, :]


def _attn_kernel_self(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                      wo_ref, bo_ref, o_ref, *, heads, cdt):
    x = x_ref[0].astype(jnp.float32)
    h = _layer_norm_f32(x, lns_ref[:], lnb_ref[:])
    o = _mha(h, h, wq_ref[:], wk_ref[:], wv_ref[:], wo_ref[:], bo_ref[:],
             None, heads, cdt)
    o_ref[0] = (x + o).astype(o_ref.dtype)


def _attn_kernel_cross(x_ref, ctx_ref, bias_ref, lns_ref, lnb_ref, wq_ref,
                       wk_ref, wv_ref, wo_ref, bo_ref, o_ref, *, heads, cdt):
    x = x_ref[0].astype(jnp.float32)
    h = _layer_norm_f32(x, lns_ref[:], lnb_ref[:])
    ctx = ctx_ref[0].astype(jnp.float32)
    o = _mha(h, ctx, wq_ref[:], wk_ref[:], wv_ref[:], wo_ref[:], bo_ref[:],
             bias_ref[0], heads, cdt)
    o_ref[0] = (x + o).astype(o_ref.dtype)


def _full(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _batched(shape):
    return pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _xla_mha(h_q, src, wq, wk, wv, wo, bo, bias, heads, cdt):
    """Batched-XLA twin of _mha (fp32 accumulation, cdt matmuls)."""
    q = jnp.einsum("btc,cd->btd", h_q.astype(cdt), wq.astype(cdt),
                   preferred_element_type=jnp.float32)
    k = jnp.einsum("bsc,cd->bsd", src.astype(cdt), wk.astype(cdt),
                   preferred_element_type=jnp.float32)
    v = jnp.einsum("bsc,cd->bsd", src.astype(cdt), wv.astype(cdt),
                   preferred_element_type=jnp.float32)
    b_, t_, inner = q.shape
    d = inner // heads
    qh = q.reshape(b_, t_, heads, d).astype(cdt)
    kh = k.reshape(b_, -1, heads, d).astype(cdt)
    vh = v.reshape(b_, -1, heads, d).astype(cdt)
    s = jnp.einsum("bthd,bshd->bhts", qh, kh,
                   preferred_element_type=jnp.float32) * d ** -0.5
    if bias is not None:
        s = s + bias[:, None, :, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p.astype(cdt), vh,
                   preferred_element_type=jnp.float32)
    o = o.reshape(b_, t_, inner)
    return jnp.einsum("btd,dc->btc", o.astype(cdt), wo.astype(cdt),
                      preferred_element_type=jnp.float32) + bo[None, None, :]


def _ln_f32_batched(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _with_xla_vjp(run_kernel, xla_twin, args):
    """custom_vjp wrapper: Pallas forward, math-identical XLA backward
    (recompute-in-backward; only primal inputs are saved)."""
    f = jax.custom_vjp(run_kernel)
    f.defvjp(lambda *a: (run_kernel(*a), a),
             lambda res, g: jax.vjp(xla_twin, *res)[1](g))
    return f(*args)


def fused_self_attention(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, *,
                         heads: int, compute_dtype=jnp.bfloat16,
                         interpret: Optional[bool] = None):
    """x + AttnOut(SDPA(LN(x))) in one kernel. x: [B, T, C].
    Differentiable via an XLA-twin VJP."""
    b, t, c = x.shape
    if interpret is None:
        interpret = _use_interpret()
    kernel = functools.partial(_attn_kernel_self, heads=heads,
                               cdt=compute_dtype)

    def run_kernel(x, ln_scale, ln_bias, wq, wk, wv, wo, bo):
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[_batched((t, c)), _full((c,)), _full((c,)),
                      _full(wq.shape), _full(wk.shape), _full(wv.shape),
                      _full(wo.shape), _full(bo.shape)],
            out_specs=_batched((t, c)),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            interpret=interpret,
        )(x, ln_scale, ln_bias, wq, wk, wv, wo, bo)

    def xla_twin(x, ln_scale, ln_bias, wq, wk, wv, wo, bo):
        xf = x.astype(jnp.float32)
        h = _ln_f32_batched(xf, ln_scale[None, None, :],
                            ln_bias[None, None, :])
        o = _xla_mha(h, h, wq, wk, wv, wo, bo, None, heads, compute_dtype)
        return (xf + o).astype(x.dtype)

    return _with_xla_vjp(run_kernel, xla_twin,
                         (x, ln_scale, ln_bias, wq, wk, wv, wo, bo))


def fused_cross_attention(x, ctx, bias, ln_scale, ln_bias, wq, wk, wv, wo,
                          bo, *, heads: int, compute_dtype=jnp.bfloat16,
                          interpret: Optional[bool] = None):
    """x + AttnOut(SDPA(q=LN(x), kv=ctx, additive bias)) in one kernel.

    x: [B, T, C]; ctx: [B, S, Ck]; bias: [B, 1, S] additive (0 / -10000).
    """
    b, t, c = x.shape
    s = ctx.shape[1]
    if interpret is None:
        interpret = _use_interpret()
    if bias is None:
        bias = jnp.zeros((b, 1, s), jnp.float32)
    kernel = functools.partial(_attn_kernel_cross, heads=heads,
                               cdt=compute_dtype)

    def run_kernel(x, ctx, bias, ln_scale, ln_bias, wq, wk, wv, wo, bo):
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[_batched((t, c)), _batched((s, ctx.shape[2])),
                      _batched((1, s)), _full((c,)), _full((c,)),
                      _full(wq.shape), _full(wk.shape), _full(wv.shape),
                      _full(wo.shape), _full(bo.shape)],
            out_specs=_batched((t, c)),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            interpret=interpret,
        )(x, ctx, bias, ln_scale, ln_bias, wq, wk, wv, wo, bo)

    def xla_twin(x, ctx, bias, ln_scale, ln_bias, wq, wk, wv, wo, bo):
        xf = x.astype(jnp.float32)
        h = _ln_f32_batched(xf, ln_scale[None, None, :],
                            ln_bias[None, None, :])
        o = _xla_mha(h, ctx.astype(jnp.float32), wq, wk, wv, wo, bo, bias,
                     heads, compute_dtype)
        return (xf + o).astype(x.dtype)

    return _with_xla_vjp(
        run_kernel, xla_twin,
        (x, ctx, bias.astype(jnp.float32), ln_scale, ln_bias, wq, wk, wv,
         wo, bo))


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7).
    lax.erf has no Pallas TPU lowering; this stays within float32 noise
    of the exact-erf gelu the reference uses (attention.py:280)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _ff_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               o_ref, *, cdt):
    x = x_ref[0].astype(jnp.float32)
    h = _layer_norm_f32(x, lns_ref[:], lnb_ref[:])
    h1 = jnp.dot(h.astype(cdt), w1_ref[:].astype(cdt),
                 preferred_element_type=jnp.float32) + b1_ref[:][None]
    inner = h1.shape[-1] // 2
    val, gate = h1[:, :inner], h1[:, inner:]
    g = val * _gelu_exact(gate)
    o = jnp.dot(g.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b2_ref[:][None]
    o_ref[0] = (x + o).astype(o_ref.dtype)


def fused_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, *,
                   tile_t: int = 128, compute_dtype=jnp.bfloat16,
                   interpret: Optional[bool] = None):
    """x + W2(GEGLU(W1(LN(x)))) in one kernel, T tiled to bound the [T, 8C]
    intermediate in VMEM. x: [B, T, C]; w1: [C, 8C]; w2: [4C, C]."""
    b, t, c = x.shape
    if interpret is None:
        interpret = _use_interpret()
    nt = pl.cdiv(t, tile_t)

    def run_kernel(x, ln_scale, ln_bias, w1, b1, w2, b2):
        return pl.pallas_call(
            functools.partial(_ff_kernel, cdt=compute_dtype),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, tile_t, c), lambda bb, i: (bb, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda bb, i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda bb, i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w1.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(b1.shape, lambda bb, i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda bb, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(b2.shape, lambda bb, i: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_t, c), lambda bb, i: (bb, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
            interpret=interpret,
        )(x, ln_scale, ln_bias, w1, b1, w2, b2)

    cdt = compute_dtype

    def xla_twin(x, ln_scale, ln_bias, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        h = _ln_f32_batched(xf, ln_scale[None, None, :],
                            ln_bias[None, None, :])
        h1 = jnp.einsum("btc,cd->btd", h.astype(cdt), w1.astype(cdt),
                        preferred_element_type=jnp.float32) \
            + b1[None, None, :]
        inner = h1.shape[-1] // 2
        g = h1[..., :inner] * _gelu_exact(h1[..., inner:])
        o = jnp.einsum("btd,dc->btc", g.astype(cdt), w2.astype(cdt),
                       preferred_element_type=jnp.float32) \
            + b2[None, None, :]
        return (xf + o).astype(x.dtype)

    return _with_xla_vjp(run_kernel, xla_twin,
                         (x, ln_scale, ln_bias, w1, b1, w2, b2))
