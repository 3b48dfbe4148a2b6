"""Flow blocks over the latent (model2/bv2 capability; model3 disables).

Parity: ``ResidualCouplingBlock`` (model3.py:435-477) and
``TransformerCouplingBlock`` (model3.py:56-119). The reference's
``share_parameter=True`` path is dead code (attentions.FFT does not exist,
SURVEY.md §7.4) and is not reproduced.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.nn.flows import Flip, ResidualCouplingLayer, TransformerCouplingLayer


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        layers = []
        for i in range(self.n_flows):
            layers.append(ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                dtype=self.dtype, name=f"flow_{i}"))
            layers.append(Flip(name=f"flip_{i}"))
        if not reverse:
            for flow in layers:
                if isinstance(flow, Flip):
                    x, _ = flow(x, x_mask, g=g, reverse=False)
                else:
                    x, _ = flow(x, x_mask, g=g, reverse=False,
                                deterministic=deterministic)
            return x
        for flow in reversed(layers):
            if isinstance(flow, Flip):
                x = flow(x, x_mask, g=g, reverse=True)
            else:
                x = flow(x, x_mask, g=g, reverse=True,
                         deterministic=deterministic)
        return x


class TransformerCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float = 0.0
    n_flows: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        layers = []
        for i in range(self.n_flows):
            layers.append(TransformerCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.n_layers, self.n_heads, self.p_dropout,
                self.filter_channels, mean_only=True,
                gin_channels=self.gin_channels, dtype=self.dtype,
                name=f"flow_{i}"))
            layers.append(Flip(name=f"flip_{i}"))
        if not reverse:
            for flow in layers:
                if isinstance(flow, Flip):
                    x, _ = flow(x, x_mask, g=g, reverse=False)
                else:
                    x, _ = flow(x, x_mask, g=g, reverse=False,
                                deterministic=deterministic)
            return x
        for flow in reversed(layers):
            if isinstance(flow, Flip):
                x = flow(x, x_mask, g=g, reverse=True)
            else:
                x = flow(x, x_mask, g=g, reverse=True,
                         deterministic=deterministic)
        return x
