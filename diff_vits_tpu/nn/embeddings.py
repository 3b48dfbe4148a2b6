"""Timestep / text-pooling embeddings for the diffusion UNet.

Parity: unet1d/embeddings.py (get_timestep_embedding:24, TimestepEmbedding:
157, Timesteps:204, TextTimeEmbedding:421, AttentionPooling:499). The
``TextTimeEmbedding`` doubles as the reference's speaker encoder
(model3.py:744 — attention pooling over the target mel).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int,
                           flip_sin_to_cos: bool = False,
                           downscale_freq_shift: float = 1.0,
                           scale: float = 1.0,
                           max_period: int = 10000) -> jax.Array:
    """Sinusoidal DDPM timestep embedding [N, dim]. embeddings.py:24."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for continuous noise levels
    (embeddings.py:221). The random projection is fixed at init
    (requires_grad=False in the reference) — enforced with stop_gradient.
    """
    embedding_size: int = 256
    scale: float = 1.0
    log: bool = True
    flip_sin_to_cos: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda k: jax.random.normal(k, (self.embedding_size,)) * self.scale)
        w = jax.lax.stop_gradient(w)
        if self.log:
            x = jnp.log(x)
        x_proj = x[:, None] * w[None, :] * (2.0 * jnp.pi)
        parts = [jnp.sin(x_proj), jnp.cos(x_proj)]
        if self.flip_sin_to_cos:
            parts = parts[::-1]
        return jnp.concatenate(parts, axis=-1)


class Timesteps(nn.Module):
    """embeddings.py:204. UNet default: flip_sin_to_cos=True, shift=0."""
    num_channels: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    def __call__(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift)


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear MLP. embeddings.py:157."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, condition=None):
        if condition is not None:
            sample = sample + nn.Dense(sample.shape[-1], use_bias=False,
                                       dtype=self.dtype,
                                       name="cond_proj")(condition)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_1")(sample)
        sample = nn.silu(sample)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype,
                        name="linear_2")(sample)


class AttentionPooling(nn.Module):
    """Class-token attention pooling. embeddings.py:499 (deep-floyd style)."""
    num_heads: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, L, C]
        bs, length, width = x.shape
        dim_per_head = self.embed_dim // self.num_heads

        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (1, self.embed_dim))
        class_token = x.mean(axis=1, keepdims=True) + pos.astype(x.dtype)
        x_all = jnp.concatenate([class_token, x], axis=1)  # [B, L+1, C]

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(class_token)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x_all)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x_all)

        def shape(t):
            # [B, L, C] -> [B*H, L, D]
            return (t.reshape(bs, -1, self.num_heads, dim_per_head)
                    .transpose(0, 2, 1, 3)
                    .reshape(bs * self.num_heads, -1, dim_per_head))

        qh, kh, vh = shape(q), shape(k), shape(v)
        scale = 1 / math.sqrt(math.sqrt(dim_per_head))
        weight = jnp.einsum("btd,bsd->bts", qh * scale, kh * scale)
        weight = jax.nn.softmax(weight.astype(jnp.float32),
                                axis=-1).astype(weight.dtype)
        a = jnp.einsum("bts,bsd->btd", weight, vh)  # [B*H, 1, D]
        a = a.reshape(bs, self.num_heads, dim_per_head)
        return a.reshape(bs, self.embed_dim)  # cls token pooled


class TextTimeEmbedding(nn.Module):
    """LN -> AttentionPooling -> proj -> LN. embeddings.py:421.

    Used both as the UNet 'text' additive embedding and as the reference-mel
    speaker encoder (model3.py:744).
    """
    encoder_dim: int
    time_embed_dim: int
    num_heads: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(hidden_states)
        h = AttentionPooling(self.num_heads, self.encoder_dim,
                             dtype=self.dtype, name="pool")(h)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="proj")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
