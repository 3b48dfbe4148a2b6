"""Low-rank adaptation (LoRA) layers for fine-tuning.

Capability parity with the reference's unet1d/lora.py (LoRALinearLayer:21,
LoRAConv1dLayer:51, LoRACompatibleConv:86, LoRACompatibleLinear:107 — always
pass-through in the reference repo; here they are usable: set ``rank > 0`` on
the compatible wrappers to enable the adapter path).

Design: the adapter is an additive low-rank branch ``up(down(x))`` scaled by
``network_alpha / rank``; ``down`` is init N(0, 1/rank), ``up`` is zero-init
so an adapted model starts exactly at the base function. On TPU both branches
are plain matmuls that XLA fuses into the base layer's MXU pass.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class LoRALinearLayer(nn.Module):
    """rank-r additive adapter for a Dense layer. Parity: lora.py:21."""
    out_features: int
    rank: int = 4
    network_alpha: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.rank > min(x.shape[-1], self.out_features):
            raise ValueError(
                f"LoRA rank {self.rank} must be <= "
                f"{min(x.shape[-1], self.out_features)}")
        h = nn.Dense(self.rank, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(1.0 / self.rank),
                     name="down")(x)
        h = nn.Dense(self.out_features, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="up")(h)
        if self.network_alpha is not None:
            h = h * (self.network_alpha / self.rank)
        return h


class LoRAConv1dLayer(nn.Module):
    """rank-r additive adapter for a 1-D conv (up is always 1x1).

    Parity: lora.py:51.
    """
    out_features: int
    rank: int = 4
    kernel_size: Tuple[int] = (1,)
    strides: Tuple[int] = (1,)
    padding: str = "SAME"
    network_alpha: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.rank, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.normal(1.0 / self.rank),
                    name="down")(x)
        h = nn.Conv(self.out_features, (1,), use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.zeros,
                    name="up")(h)
        if self.network_alpha is not None:
            h = h * (self.network_alpha / self.rank)
        return h


class LoRACompatibleDense(nn.Module):
    """Dense with an optional LoRA branch. Parity: lora.py:107
    (LoRACompatibleLinear; rank=0 == the reference's lora_layer=None)."""
    features: int
    use_bias: bool = True
    rank: int = 0
    network_alpha: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="base")(x)
        if self.rank > 0:
            y = y + LoRALinearLayer(self.features, self.rank,
                                    self.network_alpha, dtype=self.dtype,
                                    name="lora")(x)
        return y


class LoRACompatibleConv(nn.Module):
    """1-D conv with an optional LoRA branch. Parity: lora.py:86."""
    features: int
    kernel_size: Tuple[int] = (1,)
    strides: Tuple[int] = (1,)
    padding: str = "SAME"
    use_bias: bool = True
    rank: int = 0
    network_alpha: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=self.use_bias,
                    dtype=self.dtype, name="base")(x)
        if self.rank > 0:
            y = y + LoRAConv1dLayer(self.features, self.rank,
                                    self.kernel_size, self.strides,
                                    self.padding, self.network_alpha,
                                    dtype=self.dtype, name="lora")(x)
        return y
