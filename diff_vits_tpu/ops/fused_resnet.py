"""Pallas TPU fused UNet ResnetBlock (scale_shift FiLM variant).

One kernel per block: GroupNorm -> SiLU -> conv(k=3) -> GroupNorm ->
FiLM(h*(1+scale)+shift) -> SiLU -> conv(k=3) -> (+1x1 shortcut) — the
resnet.py:461/591-641 structure of the reference's denoiser, fused so each
of the UNet's ~22 resnet applications per denoise step is a single device
op instead of ~15.

TPU mapping notes:
- GroupNorm reduces over channel groups with two tiny indicator matmuls
  ([T,C]@[C,G] for group sums, [T,G]@[G,C] to broadcast back) — MXU-native,
  no sublane reshapes.
- The k=3 SAME conv is three shifted [T,C]@[C,Co] matmuls; block = full
  sequence, so edge taps see true zeros.
- The FiLM projection Dense(silu(temb)) is computed outside (one tiny XLA
  op per batch/step); the kernel takes the ready [2*Co] scale/shift row.

Inference-only (training keeps the autodiff-friendly XLA formulation).
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


def _group_norm(x, scale, bias, groups: int, eps: float):
    """GroupNorm over (time x group channels), matching nn.GroupNorm."""
    t, c = x.shape
    gs = c // groups
    cg = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // gs
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (cg == gi).astype(jnp.float32)          # [C, G]
    n = t * gs
    mean_g = jnp.sum(jnp.dot(x, ind, preferred_element_type=jnp.float32),
                     axis=0, keepdims=True) / n               # [1, G]
    sq_g = jnp.sum(jnp.dot(x * x, ind, preferred_element_type=jnp.float32),
                   axis=0, keepdims=True) / n
    mean = jnp.dot(mean_g, ind.T, preferred_element_type=jnp.float32)
    var = jnp.dot(sq_g, ind.T, preferred_element_type=jnp.float32) - mean ** 2
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    return h * scale[None, :] + bias[None, :]


def _conv3(h, w, b, cdt):
    """SAME k=3 conv as three shifted matmuls. h: [T, Ci]; w: [3, Ci, Co]."""
    t = h.shape[0]
    z = jnp.zeros((1, h.shape[1]), h.dtype)
    hm = jnp.concatenate([z, h[:t - 1]], axis=0)   # h[t-1]
    hp = jnp.concatenate([h[1:], z], axis=0)       # h[t+1]
    out = jnp.dot(hm.astype(cdt), w[0].astype(cdt),
                  preferred_element_type=jnp.float32)
    out = out + jnp.dot(h.astype(cdt), w[1].astype(cdt),
                        preferred_element_type=jnp.float32)
    out = out + jnp.dot(hp.astype(cdt), w[2].astype(cdt),
                        preferred_element_type=jnp.float32)
    return out + b[None, :]


def _kernel(x_ref, film_ref, g1s_ref, g1b_ref, w1_ref, b1_ref, g2s_ref,
            g2b_ref, w2_ref, b2_ref, ws_ref, bs_ref, o_ref, *, groups: int,
            eps: float, shortcut: bool, cdt):
    x = x_ref[0].astype(jnp.float32)
    co = w1_ref.shape[-1]
    h = _group_norm(x, g1s_ref[:], g1b_ref[:], groups, eps)
    h = h * jax.nn.sigmoid(h)                       # silu
    h = _conv3(h, w1_ref[:], b1_ref[:], cdt)
    h = _group_norm(h, g2s_ref[:], g2b_ref[:], groups, eps)
    film = film_ref[0, 0]
    h = h * (1.0 + film[:co][None, :]) + film[co:][None, :]
    h = h * jax.nn.sigmoid(h)
    h = _conv3(h, w2_ref[:], b2_ref[:], cdt)
    if shortcut:
        sc = jnp.dot(x.astype(cdt), ws_ref[:].astype(cdt),
                     preferred_element_type=jnp.float32) + bs_ref[:][None]
    else:
        sc = x
    o_ref[0] = (sc + h).astype(o_ref.dtype)


def _xla_twin(x, film, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
              w2, b2, w_short, b_short, *, groups, eps, shortcut, cdt):
    """Plain-XLA formulation with the kernel's exact math — the backward
    rule for the fused op (recompute-in-backward, remat-style)."""
    def gn(h, scale, bias):
        b_, t_, c_ = h.shape
        hg = h.reshape(b_, t_, groups, c_ // groups)
        mu = hg.mean(axis=(1, 3), keepdims=True)
        var = jnp.square(hg - mu).mean(axis=(1, 3), keepdims=True)
        hn = ((hg - mu) * jax.lax.rsqrt(var + eps)).reshape(b_, t_, c_)
        return hn * scale[None, None, :] + bias[None, None, :]

    def conv3(h, w, b_):
        z = jnp.zeros_like(h[:, :1])
        hm = jnp.concatenate([z, h[:, :-1]], axis=1)
        hp = jnp.concatenate([h[:, 1:], z], axis=1)
        out = jnp.einsum("btc,cd->btd", hm.astype(cdt), w[0].astype(cdt),
                         preferred_element_type=jnp.float32)
        out = out + jnp.einsum("btc,cd->btd", h.astype(cdt),
                               w[1].astype(cdt),
                               preferred_element_type=jnp.float32)
        out = out + jnp.einsum("btc,cd->btd", hp.astype(cdt),
                               w[2].astype(cdt),
                               preferred_element_type=jnp.float32)
        return out + b_[None, None, :]

    xf = x.astype(jnp.float32)
    co = w1.shape[-1]
    h = gn(xf, gn1_scale, gn1_bias)
    h = h * jax.nn.sigmoid(h)
    h = conv3(h, w1, b1)
    h = gn(h, gn2_scale, gn2_bias)
    h = h * (1.0 + film[:, None, :co]) + film[:, None, co:]
    h = h * jax.nn.sigmoid(h)
    h = conv3(h, w2, b2)
    if shortcut:
        sc = jnp.einsum("btc,cd->btd", xf.astype(cdt), w_short.astype(cdt),
                        preferred_element_type=jnp.float32) \
            + b_short[None, None, :]
    else:
        sc = xf
    return (sc + h).astype(x.dtype)


def fused_resnet_block(x, film, gn1_scale, gn1_bias, w1, b1, gn2_scale,
                       gn2_bias, w2, b2, w_short=None, b_short=None, *,
                       groups: int = 32, eps: float = 1e-5,
                       compute_dtype=jnp.bfloat16,
                       interpret: Optional[bool] = None):
    """Whole scale_shift ResnetBlock in one kernel.

    x: [B, T, Ci]; film: [B, 2*Co] (already silu+Dense-projected temb);
    w1: [3, Ci, Co]; w2: [3, Co, Co]; w_short: [Ci, Co] or None (identity).

    Differentiable: the VJP recomputes through the math-identical XLA twin
    (remat-style — only the primal inputs are saved), so `grad` through the
    fused path is well-defined; the training path still *defaults* to the
    XLA formulation per the A/B measurements.
    """
    b, t, ci = x.shape
    co = w1.shape[-1]
    if interpret is None:
        interpret = _use_interpret()
    shortcut = w_short is not None
    if not shortcut:  # placeholders keep the operand list static
        w_short = jnp.zeros((ci, co), x.dtype)
        b_short = jnp.zeros((co,), jnp.float32)

    def full(a):
        return pl.BlockSpec(a.shape, lambda bb: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def batched(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda bb: (bb,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, groups=groups, eps=eps,
                               shortcut=shortcut, cdt=compute_dtype)

    def run_kernel(x, film, gn1_scale, gn1_bias, w1, b1, gn2_scale,
                   gn2_bias, w2, b2, w_short, b_short):
        # film rides as [B, 1, 2Co]: a (1, 1, 2Co) block's trailing dims
        # equal the array's, which Mosaic requires for B > 1 (a (1, 2Co)
        # block over [B, 2Co] is rejected: 1 is neither 8-divisible nor B)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[batched((t, ci)), batched((1, 2 * co)),
                      full(gn1_scale), full(gn1_bias), full(w1), full(b1),
                      full(gn2_scale), full(gn2_bias), full(w2), full(b2),
                      full(w_short), full(b_short)],
            out_specs=batched((t, co)),
            out_shape=jax.ShapeDtypeStruct((b, t, co), x.dtype),
            interpret=interpret,
        )(x, film[:, None, :], gn1_scale, gn1_bias, w1, b1, gn2_scale,
          gn2_bias, w2, b2, w_short, b_short)

    xla_twin = functools.partial(_xla_twin, groups=groups, eps=eps,
                                 shortcut=shortcut, cdt=compute_dtype)
    f = jax.custom_vjp(run_kernel)
    f.defvjp(lambda *a: (run_kernel(*a), a),
             lambda res, g: jax.vjp(xla_twin, *res)[1](g))
    return f(x, film, gn1_scale, gn1_bias, w1, b1, gn2_scale, gn2_bias,
             w2, b2, w_short, b_short)
