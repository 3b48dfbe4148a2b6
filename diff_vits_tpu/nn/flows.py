"""Normalizing-flow steps (VITS coupling flows), channel-last.

Parity: modules.py:363-598 (Log, Flip, ElementwiseAffine,
ResidualCouplingLayer, ConvFlow, TransformerCouplingLayer). Each flow step is
a linen module with ``reverse`` as a call argument; `forward` returns
``(y, logdet)`` and `reverse` returns ``y`` only, mirroring the reference
API shape.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.nn.layers import DDSConv, Encoder, WN
from diff_vits_tpu.ops.spline import piecewise_rational_quadratic_transform


class Log(nn.Module):
    """Parity: modules.py:363."""

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    """Channel flip. Parity: modules.py:374."""

    @nn.compact
    def __call__(self, x, *args, reverse: bool = False, **kwargs):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros(x.shape[0], dtype=x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    """Parity: modules.py:384."""
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine coupling over a WN stack. Parity: modules.py:402."""
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden_channels, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels,
               p_dropout=self.p_dropout, dtype=self.dtype, name="enc")(
                   h, x_mask, g=g, deterministic=deterministic)
        stats = nn.Dense(half * (2 - self.mean_only), dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name="post")(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """RQ-spline coupling over DDSConv. Parity: modules.py:459.

    The reverse (sampling) path can evaluate the spline as one Pallas
    program (ops/spline_pallas.py) — opt-in via ``DIFF_VITS_FUSED`` or
    ``use_fused=True``; the forward/training path keeps the XLA
    formulation for autodiff.
    """
    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0
    use_fused: object = "auto"
    dtype: jnp.dtype = jnp.float32

    def _fused_enabled(self, reverse: bool) -> bool:
        if not reverse:
            return False
        from diff_vits_tpu.ops import fused_gate
        return fused_gate("DIFF_VITS_FUSED_SPLINE", self.use_fused,
                          default=False)

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.filter_channels, dtype=self.dtype, name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    p_dropout=0.0, dtype=self.dtype, name="convs")(
                        h, x_mask, g=g, deterministic=deterministic)
        h = nn.Dense(half * (self.num_bins * 3 - 1), dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name="proj")(h) * x_mask

        b, t, _ = x0.shape
        # [B, T, half, 3*bins-1]; reference reshapes [B, C, ?, T] -> [B,C,T,?]
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)

        uw = h[..., :self.num_bins] / math.sqrt(self.filter_channels)
        uh = h[..., self.num_bins:2 * self.num_bins] / math.sqrt(self.filter_channels)
        ud = h[..., 2 * self.num_bins:]

        if self._fused_enabled(reverse):
            from diff_vits_tpu.ops.spline_pallas import unconstrained_rqs_pallas
            x1_t, logabsdet = unconstrained_rqs_pallas(
                x1, uw, uh, ud, inverse=reverse,
                tail_bound=self.tail_bound)
        else:
            x1_t, logabsdet = piecewise_rational_quadratic_transform(
                x1, uw, uh, ud, inverse=reverse, tails="linear",
                tail_bound=self.tail_bound)

        x_out = jnp.concatenate([x0, x1_t], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x_out, logdet
        return x_out


class TransformerCouplingLayer(nn.Module):
    """Coupling over an attention Encoder. Parity: modules.py:519."""
    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int
    p_dropout: float = 0.0
    filter_channels: int = 0
    mean_only: bool = False
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden_channels, dtype=self.dtype, name="pre")(x0) * x_mask
        h = Encoder(self.hidden_channels, self.filter_channels, self.n_heads,
                    self.n_layers, self.kernel_size, self.p_dropout,
                    gin_channels=self.gin_channels, dtype=self.dtype,
                    name="enc")(h, x_mask, g=g, deterministic=deterministic)
        stats = nn.Dense(half * (2 - self.mean_only), dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name="post")(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)
