"""VITS pre-model: prior + posterior + MAS + duration + content refiner.

Parity: model3.py:644-860 (`VITS.forward` / `VITS.infer`). Model2/bv2
capability (latent flow) is available behind ``cfg.use_flow``.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.core import masking
from diff_vits_tpu.core.config import VitsConfig
from diff_vits_tpu.models.duration import (
    DurationPredictor,
    DurationPredictorUNet,
    StochasticDurationPredictor,
)
from diff_vits_tpu.models.encoders import PosteriorEncoder, PromptEncoder, TextEncoder
from diff_vits_tpu.models.flow import ResidualCouplingBlock, TransformerCouplingBlock
from diff_vits_tpu.nn.embeddings import TextTimeEmbedding
from diff_vits_tpu.ops.mas import maximum_path


class VITS(nn.Module):
    """Zero-shot VITS prior (no GAN decoder; content goes to the diffusion
    decoder). All tensors channel-last [B, T, C]."""
    n_vocab: int
    cfg: VitsConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.enc_p = TextEncoder(
            self.n_vocab, c.inter_channels, c.hidden_channels,
            c.filter_channels, c.n_heads, c.n_layers, c.kernel_size,
            c.p_dropout, gin_channels=c.gin_channels, dtype=self.dtype)
        self.enc_q = PosteriorEncoder(
            c.posterior_in_channels, c.inter_channels, c.hidden_channels,
            c.posterior_kernel_size, c.posterior_dilation_rate,
            c.posterior_n_layers, gin_channels=c.gin_channels,
            dtype=self.dtype)
        # speaker conditioning: attention pooling over the target mel
        # (model3.py:744 — TextTimeEmbedding(100, gin, 1))
        self.ref_enc = TextTimeEmbedding(
            c.posterior_in_channels, c.gin_channels, num_heads=1,
            dtype=self.dtype)
        if c.duration_predictor == "unet":
            self.dp = DurationPredictorUNet(
                c.hidden_channels, 256, c.posterior_in_channels, 3, 0.5,
                dtype=self.dtype)
        elif c.duration_predictor == "sdp":
            self.dp = StochasticDurationPredictor(
                c.hidden_channels, 192, 3, 0.5, 4,
                gin_channels=c.gin_channels, dtype=self.dtype)
        else:
            self.dp = DurationPredictor(
                c.hidden_channels, 256, 3, 0.5, gin_channels=c.gin_channels,
                dtype=self.dtype)
        if c.use_flow:
            if c.use_transformer_flow:
                self.flow = TransformerCouplingBlock(
                    c.inter_channels, c.hidden_channels, c.filter_channels,
                    c.n_heads, c.n_layers_trans_flow, 5, c.p_dropout,
                    c.n_flow_layer, gin_channels=c.gin_channels,
                    dtype=self.dtype)
            else:
                self.flow = ResidualCouplingBlock(
                    c.inter_channels, c.hidden_channels, 5, 1, 4,
                    n_flows=c.n_flow_layer, gin_channels=c.gin_channels,
                    dtype=self.dtype)
        if c.use_phoneme_vae:
            from diff_vits_tpu.models.phoneme_vae import PhonemeVAE
            self.phoneme_vae = PhonemeVAE(
                c.inter_channels, c.hidden_channels,
                n_flow_layer=c.n_flow_layer, gin_channels=c.gin_channels,
                dtype=self.dtype)
        self.o_proj = PromptEncoder(
            c.inter_channels, c.hidden_channels, c.inter_channels, 6, 0.2,
            gin_channels=c.gin_channels, dtype=self.dtype)

    def __call__(self, x, x_lengths, y, y_lengths, tone, language, *,
                 mas_noise_scale=0.0, rngs_noise_key=None,
                 deterministic: bool = True):
        """Training forward. Parity: model3.py:755-814.

        Returns (content, y_lengths, (l_length, loss_kl)).
        """
        c = self.cfg
        g = self.ref_enc(y)[:, None, :]  # [B, 1, gin]
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, tone, language, g=g, deterministic=deterministic)
        key_q, key_mas = (jax.random.split(rngs_noise_key)
                          if rngs_noise_key is not None else (None, None))
        z, m_q, logs_q, y_mask = self.enc_q(
            y, y_lengths, g=g, noise_key=key_q, deterministic=deterministic)
        z_p = z  # flow disabled in model3 (model3.py:762-763)
        if c.use_flow:
            z_p = self.flow(z, y_mask, g=g, deterministic=deterministic)

        # negative cross-entropy for MAS (model3.py:765-787), fp32, no grads
        zf = jax.lax.stop_gradient(z_p.astype(jnp.float32))
        m_pf = jax.lax.stop_gradient(m_p.astype(jnp.float32))
        logs_pf = jax.lax.stop_gradient(logs_p.astype(jnp.float32))
        s_p_sq_r = jnp.exp(-2.0 * logs_pf)  # [B, Tx, D]
        neg_cent1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_pf,
                            axis=-1)  # [B, Tx]
        neg_cent2 = jnp.einsum("byd,bxd->byx", -0.5 * zf ** 2, s_p_sq_r)
        neg_cent3 = jnp.einsum("byd,bxd->byx", zf, m_pf * s_p_sq_r)
        neg_cent4 = jnp.sum(-0.5 * m_pf ** 2 * s_p_sq_r, axis=-1)  # [B, Tx]
        neg_cent = (neg_cent1[:, None, :] + neg_cent2 + neg_cent3
                    + neg_cent4[:, None, :])  # [B, Ty, Tx]
        if key_mas is not None and mas_noise_scale is not None:
            eps = (jnp.std(neg_cent)
                   * jax.random.normal(key_mas, neg_cent.shape)
                   * mas_noise_scale)
            neg_cent = neg_cent + eps

        attn_mask = (y_mask[:, :, 0][:, :, None]
                     * x_mask[:, :, 0][:, None, :])  # [B, Ty, Tx]
        attn = jax.lax.stop_gradient(maximum_path(neg_cent, attn_mask))

        w = attn.sum(axis=1)  # [B, Tx] durations
        if c.duration_predictor == "sdp":
            # flow NLL objective (model3.py:122-230 / model2.py:825)
            key_dur = (jax.random.fold_in(rngs_noise_key, 3)
                       if rngs_noise_key is not None
                       else jax.random.PRNGKey(0))
            nll = self.dp(x_h, x_mask, w=w[..., None], g=g, reverse=False,
                          rng_key=key_dur, deterministic=deterministic)
            l_length = (jnp.sum(nll.astype(jnp.float32))
                        / jnp.sum(x_mask.astype(jnp.float32)))
        else:
            logw_ = jnp.log(w + 1e-6)[..., None] * x_mask
            if c.duration_predictor == "conv":
                logw = self.dp(x_h, x_mask, g=g,
                               deterministic=deterministic)
            else:
                logw = self.dp(x_h, x_lengths, y, y_lengths,
                               deterministic=deterministic)
            l_length = jnp.sum((logw - logw_) ** 2,
                               axis=(1, 2)) / jnp.sum(x_mask)
            l_length = jnp.sum(l_length.astype(jnp.float32))

        # expand prior over the alignment (model3.py:807-808)
        m_p_e = jnp.einsum("byx,bxd->byd", attn, m_p)
        logs_p_e = jnp.einsum("byx,bxd->byd", attn, logs_p)

        loss_kl = masking.kl_loss(z_p, logs_q, m_p_e, logs_p_e, y_mask)

        loss_kl_ph = jnp.zeros((), jnp.float32)
        if c.use_phoneme_vae:
            # bv2 prosody VAE (bv2.py:758-775); warmup gating is applied by
            # the caller via `phoneme_vae_scale`
            key_ph = (jax.random.fold_in(rngs_noise_key, 2)
                      if rngs_noise_key is not None else None)
            prosody, loss_kl_ph = self.phoneme_vae(
                z, attn, x_h, x_mask, g=g, noise_key=key_ph,
                deterministic=deterministic)
            z = z + prosody

        content = self.o_proj(z, y_lengths, g=g, deterministic=deterministic)
        return content, y_lengths, (l_length, loss_kl, loss_kl_ph)

    def _predict_durations(self, x, x_lengths, y, y_lengths, tone, language,
                           *, noise_key, length_scale=1.0,
                           deterministic: bool = True):
        """Shared text->duration path of inference (model3.py:831-842):
        speaker embedding, text encoding, duration prediction, ceil.
        Returns (g, x_h, m_p, logs_p, x_mask, w_ceil, out_lengths) with
        ``out_lengths`` the *unclamped* ceil(sum w) frame counts."""
        c = self.cfg
        g = self.ref_enc(y)[:, None, :]
        x_h, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, tone, language, g=g, deterministic=deterministic)
        if c.duration_predictor == "sdp":
            logw = self.dp(x_h, x_mask, g=g, reverse=True,
                           noise_scale=0.8,
                           rng_key=jax.random.fold_in(noise_key, 3),
                           deterministic=deterministic)
        elif c.duration_predictor == "conv":
            logw = self.dp(x_h, x_mask, g=g, deterministic=deterministic)
        else:
            logw = self.dp(x_h, x_lengths, y, y_lengths,
                           deterministic=deterministic)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]  # [B, Tx]
        out_lengths = jnp.maximum(
            jnp.sum(w_ceil, axis=-1), 1.0).astype(jnp.int32)
        return g, x_h, m_p, logs_p, x_mask, w_ceil, out_lengths

    def predict_lengths(self, x, x_lengths, y, y_lengths, tone, language, *,
                        noise_key, length_scale=1.0,
                        deterministic: bool = True):
        """Predicted output mel lengths [B] without generating content.

        The reference derives ``y_lengths = ceil(sum w)`` inline with no cap
        (model3.py:842-847); under jit the mel buffer must be static, so
        serving uses this cheap pass to pick a mel-length bucket per
        utterance *before* committing to a synthesis shape."""
        return self._predict_durations(
            x, x_lengths, y, y_lengths, tone, language, noise_key=noise_key,
            length_scale=length_scale, deterministic=deterministic)[-1]

    def infer(self, x, x_lengths, y, y_lengths, tone, language, *,
              noise_key, noise_scale=0.667, length_scale=1.0,
              max_len: Optional[int] = None, deterministic: bool = True):
        """Inference. Parity: model3.py:817-860.

        ``max_len`` bounds the generated mel length (static under jit);
        returns (content [B, Ty, C], out_lengths [B]).
        """
        c = self.cfg
        g, x_h, m_p, logs_p, x_mask, w_ceil, out_lengths = \
            self._predict_durations(
                x, x_lengths, y, y_lengths, tone, language,
                noise_key=noise_key, length_scale=length_scale,
                deterministic=deterministic)
        t_y = max_len if max_len is not None else x.shape[1] * 16
        out_lengths = jnp.minimum(out_lengths, t_y)
        y_mask = masking.sequence_mask(out_lengths, t_y).astype(
            x_mask.dtype)[..., None]
        attn_mask = (y_mask[:, :, 0][:, :, None]
                     * x_mask[:, :, 0][:, None, :])
        attn = masking.generate_path(w_ceil, attn_mask)

        m_p_e = jnp.einsum("byx,bxd->byd", attn, m_p)
        logs_p_e = jnp.einsum("byx,bxd->byd", attn, logs_p)
        z_p = m_p_e + jax.random.normal(
            noise_key, m_p_e.shape, m_p_e.dtype) * jnp.exp(logs_p_e) * noise_scale
        z = z_p
        if c.use_flow:
            z = self.flow(z_p, y_mask, g=g, reverse=True,
                          deterministic=deterministic) * y_mask
        if c.use_phoneme_vae:
            # bv2 inference prosody injection (bv2.py:793-828)
            prosody = self.phoneme_vae.infer(
                attn, x_h, x_mask, g=g,
                noise_key=jax.random.fold_in(noise_key, 3),
                noise_scale=noise_scale, deterministic=deterministic)
            z = z + prosody
        content = self.o_proj(z, out_lengths, g=g,
                              deterministic=deterministic)
        return content, out_lengths
