"""Parameter holders with flax-built-in tree layouts and initializers.

Fused Pallas paths need the raw weight arrays, but must keep parameter
trees byte-identical to their XLA twins (nn.Dense / nn.LayerNorm /
nn.GroupNorm / nn.Conv) so flipping the route never touches a checkpoint.
These holders declare exactly those params (module class name does not
affect the tree) and return the arrays.
"""
from __future__ import annotations

from flax import linen as nn


class DenseParams(nn.Module):
    """nn.Dense-compatible kernel/bias holder."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,)) if self.use_bias else None)
        return kernel, bias


class NormParams(nn.Module):
    """Scale/bias holder matching nn.LayerNorm AND nn.GroupNorm (their
    parameter names, shapes, and initializers are identical)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class ConvParams(nn.Module):
    """nn.Conv-compatible kernel/bias holder (1-D, feature-last)."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias
