"""Phoneme-level prosody VAE (the bv2 variant's distinctive feature).

Capability parity: bv2.py:540-575 (``Ph_Encoder``), :563-588
(``Ph_p_encoder``), :697 (``phoneme_flow``), :758-775 (grouping + prosody
injection) and the segment utilities ``group_hidden_by_segs`` /
``generate_index`` (model.py:511-535).

TPU redesign: the reference groups frame latents by phoneme via
``scatter_add_`` + python ``repeat_interleave`` loops; with the hard MAS
alignment ``attn [B, Ty, Tx]`` both directions are plain matmuls —
  pooled    = attn^T @ z / max(counts, 1)       (group by segment)
  expanded  = attn @ pooled                      (repeat per frame)
which lower straight onto the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.models.flow import ResidualCouplingBlock
from diff_vits_tpu.nn.fairseq import EncSALayer


def group_by_alignment(z: jax.Array, attn: jax.Array) -> jax.Array:
    """Mean-pool frame features into phoneme segments via the hard path.

    z: [B, Ty, C]; attn: [B, Ty, Tx] -> [B, Tx, C].
    Parity: model.py:511 (group_hidden_by_segs).
    """
    counts = attn.sum(axis=1)  # [B, Tx] = durations
    pooled = jnp.einsum("byx,byc->bxc", attn, z)
    return pooled / jnp.maximum(counts, 1.0)[..., None]


def expand_by_alignment(ph: jax.Array, attn: jax.Array) -> jax.Array:
    """Repeat phoneme features per frame. ph: [B, Tx, C] -> [B, Ty, C].

    Parity: bv2.py:765-767 (repeat_interleave prosody injection).
    """
    return jnp.einsum("byx,bxc->byc", attn, ph)


class PhEncoder(nn.Module):
    """Phoneme posterior: 1x1 -> (m, logs) -> z. Parity: bv2.py:540."""
    hidden_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, *, noise_key=None):
        h = nn.Dense(self.hidden_channels, dtype=self.dtype,
                     name="pre")(x) * x_mask
        stats = nn.Dense(self.out_channels * 2, dtype=self.dtype,
                         name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if noise_key is None:
            z = m * x_mask
        else:
            z = (m + jax.random.normal(noise_key, m.shape, m.dtype)
                 * jnp.exp(logs)) * x_mask
        return z, m, logs


class PhPriorEncoder(nn.Module):
    """Phoneme prior over text hiddens: EncSA stack -> (m, logs).

    Parity: bv2.py:563 (Ph_p_encoder, 4 x op-code-8 layers).
    """
    hidden_channels: int
    out_channels: int
    n_layers: int = 4
    p_dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, *, noise_key=None,
                 deterministic: bool = True):
        h = nn.Dense(self.hidden_channels, dtype=self.dtype,
                     name="pre")(x) * x_mask
        for i in range(self.n_layers):
            h = EncSALayer(num_heads=8, dropout=self.p_dropout,
                           attention_dropout=0.0,
                           relu_dropout=self.p_dropout, kernel_size=9,
                           dtype=self.dtype, name=f"layer_{i}")(
                               h, x_mask, deterministic=deterministic)
        stats = nn.Dense(self.out_channels * 2, dtype=self.dtype,
                         name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if noise_key is None:
            z = m * x_mask
        else:
            z = (m + jax.random.normal(noise_key, m.shape, m.dtype)
                 * jnp.exp(logs)) * x_mask
        return z, m, logs


class PhonemeVAE(nn.Module):
    """Full phoneme prosody VAE: posterior + flow + prior.

    Training: returns (prosody [B, Ty, C], loss_kl_ph); inference: samples
    the prior, inverts the flow, expands to frames.
    """
    inter_channels: int
    hidden_channels: int
    n_flow_layer: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ph_encoder_q = PhEncoder(self.inter_channels,
                                      self.inter_channels, dtype=self.dtype)
        self.phoneme_flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1,
            self.n_flow_layer, gin_channels=self.gin_channels,
            dtype=self.dtype)
        self.ph_enc_p = PhPriorEncoder(self.hidden_channels,
                                       self.inter_channels, dtype=self.dtype)

    def __call__(self, z, attn, x_hidden, x_mask, g=None, *,
                 noise_key=None, deterministic: bool = True):
        """Training path (bv2.py:758-775). Returns (prosody, loss_kl_ph)."""
        from diff_vits_tpu.core.masking import kl_loss

        z_ph = group_by_alignment(z, attn)
        z_q_ph, m_q_ph, logs_q_ph = self.ph_encoder_q(
            z_ph, x_mask, noise_key=noise_key)
        z_p_ph = self.phoneme_flow(z_q_ph, x_mask, g=g,
                                   deterministic=deterministic)
        _, m_p_ph, logs_p_ph = self.ph_enc_p(
            x_hidden, x_mask, deterministic=deterministic)
        loss_kl_ph = kl_loss(z_p_ph, logs_q_ph, m_p_ph, logs_p_ph, x_mask)
        prosody = expand_by_alignment(z_q_ph, attn)
        return prosody, loss_kl_ph

    def infer(self, attn, x_hidden, x_mask, g=None, *, noise_key,
              noise_scale: float = 0.667, deterministic: bool = True):
        """Inference path (bv2.py:793-799)."""
        _, m_p_ph, logs_p_ph = self.ph_enc_p(
            x_hidden, x_mask, deterministic=deterministic)
        ph_p = m_p_ph + jax.random.normal(
            noise_key, m_p_ph.shape, m_p_ph.dtype) * jnp.exp(logs_p_ph) \
            * noise_scale
        z_q_ph = self.phoneme_flow(ph_p, x_mask, g=g, reverse=True,
                                   deterministic=deterministic)
        return expand_by_alignment(z_q_ph, attn)
