"""Encoder stacks: text prior, mel posterior, prompt refiner, speaker ref.

Parity targets: ``TextEncoder`` (model3.py:321), ``PosteriorEncoder``
(model3.py:526), ``PromptEncoder`` (model3.py:382) and the attention-pooling
speaker encoder (model3.py:744 = TextTimeEmbedding). Layout [B, T, C].
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.core import masking
from diff_vits_tpu.nn.fairseq import ConvLayer, EncSALayer
from diff_vits_tpu.nn.layers import Encoder, WN


class TextEncoder(nn.Module):
    """phoneme+tone+language embeddings -> rel-pos transformer -> (m, logs).

    Parity: model3.py:321-381 (hidden 256, filter 256, 2 heads, 6 layers,
    kernel 3, speaker-conditioned at layer 2, proj -> 2 x inter_channels).
    """
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0
    num_tones: int = 11
    num_languages: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, tone, language, g=None, *,
                 deterministic: bool = True):
        h = self.hidden_channels
        init = nn.initializers.normal(h ** -0.5)
        emb = nn.Embed(self.n_vocab, h, embedding_init=init, name="emb")(x)
        tone_emb = nn.Embed(self.num_tones, h, embedding_init=init,
                            name="tone_emb")(tone)
        lang_emb = nn.Embed(self.num_languages, h, embedding_init=init,
                            name="language_emb")(language)
        xh = (emb + tone_emb + lang_emb) * math.sqrt(h)  # [B, T, H]
        x_mask = masking.sequence_mask(x_lengths, xh.shape[1]).astype(
            xh.dtype)[..., None]

        xh = Encoder(h, self.filter_channels, self.n_heads, self.n_layers,
                     self.kernel_size, self.p_dropout,
                     gin_channels=self.gin_channels, dtype=self.dtype,
                     name="encoder")(xh * x_mask, x_mask, g=g,
                                     deterministic=deterministic)
        stats = nn.Dense(self.out_channels * 2, dtype=self.dtype,
                         name="proj")(xh) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return xh, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """mel -> 1x1 -> WN(16) -> (m, logs) -> z. Parity: model3.py:526-572."""
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, g=None, *, noise_key=None,
                 deterministic: bool = True):
        x_mask = masking.sequence_mask(x_lengths, x.shape[1]).astype(
            x.dtype)[..., None]
        h = nn.Dense(self.hidden_channels, dtype=self.dtype,
                     name="pre")(x) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels,
               dtype=self.dtype, name="enc")(h, x_mask, g=g,
                                             deterministic=deterministic)
        stats = nn.Dense(self.out_channels * 2, dtype=self.dtype,
                         name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if noise_key is None:
            z = m * x_mask
        else:
            z = (m + jax.random.normal(noise_key, m.shape, m.dtype)
                 * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask


class PromptEncoder(nn.Module):
    """Content-latent refiner: pre conv -> N x EncSALayer -> out proj (+LN).

    Parity: model3.py:382-433 (arch code 8 per layer: 8 heads, ffn kernel 9).
    """
    in_channels: int = 128
    hidden_channels: int = 512
    out_channels: int = 128
    n_layers: int = 6
    p_dropout: float = 0.2
    last_ln: bool = True
    gin_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, g=None, *, deterministic: bool = True):
        if g is not None and self.gin_channels is not None:
            gp = nn.Dense(self.in_channels, dtype=self.dtype, name="g_proj")(g)
            x = x + gp
        keep = masking.sequence_mask(lengths, x.shape[1]).astype(
            x.dtype)[..., None]
        x = ConvLayer(self.hidden_channels, 1, self.p_dropout,
                      dtype=self.dtype, name="pre")(x, keep,
                                                    deterministic=deterministic)
        x = x * keep
        for i in range(self.n_layers):
            x = EncSALayer(num_heads=8, dropout=self.p_dropout,
                           attention_dropout=0.0, relu_dropout=self.p_dropout,
                           kernel_size=9, dtype=self.dtype,
                           name=f"layer_{i}")(x, keep,
                                              deterministic=deterministic)
        x = ConvLayer(self.out_channels, 1, dtype=self.dtype,
                      name="out_proj")(x, None, deterministic=deterministic)
        x = x * keep
        if self.last_ln:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="layer_norm")(x)
            x = x * keep
        return x


class ReferenceEncoder(nn.Module):
    """GST-style conv-GRU reference encoder (model3.py:574-630 — unused in
    the active path; kept for capability parity). The GRU is expressed as a
    ``lax.scan`` over frames."""
    spec_channels: int
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        # inputs: [B, Ty, n_mels]
        ref_enc_filters = [32, 32, 64, 64, 128, 128]
        x = inputs[..., None]  # [B, Ty, n_mels, 1]
        for i, ch in enumerate(ref_enc_filters):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        gru = nn.GRUCell(128, dtype=self.dtype, name="gru")
        carry = jnp.zeros((b, 128), x.dtype)

        def step(carry, xt):
            return gru(carry, xt)

        carry, _ = jax.lax.scan(step, carry, jnp.moveaxis(x, 1, 0))
        return nn.Dense(self.gin_channels, dtype=self.dtype,
                        name="proj")(carry)


class SpeakerEncoder(nn.Module):
    """LSTM d-vector speaker encoder (model3.py:631-642 — unused in the
    active path; kept for capability parity). Returns an L2-normalized
    embedding."""
    model_hidden_size: int = 256
    model_embedding_size: int = 256
    model_num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mels):
        # mels: [B, T, n_mels]
        h = mels
        for i in range(self.model_num_layers):
            cell = nn.OptimizedLSTMCell(self.model_hidden_size,
                                        dtype=self.dtype, name=f"lstm_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
        last = h[:, -1]
        emb = nn.relu(nn.Dense(self.model_embedding_size, dtype=self.dtype,
                               name="linear")(last))
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
