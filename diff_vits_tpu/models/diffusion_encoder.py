"""Conditional diffusion denoiser: prompt encoder + UNet1D.

Parity: ``Diffusion_Encoder`` (model3.py:867-914): prompt mel (100ch) ->
PromptEncoder(4 layers, hidden=128) -> cross-attn keys; noisy mel (100ch)
concat content (128ch) -> UNet1D(block_out (128,256,384,512), groups 8,
heads 8, 'text' additive embedding, scale_shift) -> x0 prediction (100ch).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.core import masking
from diff_vits_tpu.core.config import DiffusionEncoderConfig
from diff_vits_tpu.models.encoders import PromptEncoder
from diff_vits_tpu.nn.unet1d import UNet1DConditionModel


class DiffusionEncoder(nn.Module):
    cfg: DiffusionEncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.prompt_encoder = PromptEncoder(
            c.in_channels, c.hidden_channels, c.hidden_channels,
            c.n_prompt_layers, 0.2, dtype=self.dtype)
        self.unet = UNet1DConditionModel(
            in_channels=c.in_channels + c.hidden_channels,
            out_channels=c.out_channels,
            block_out_channels=c.block_out_channels,
            norm_num_groups=8,
            cross_attention_dim=c.hidden_channels,
            attention_head_dim=c.n_heads,
            addition_embed_type="text",
            resnet_time_scale_shift="scale_shift",
            moe_experts=getattr(c, "moe_experts", 0),
            moe_top_k=getattr(c, "moe_top_k", 2),
            dtype=self.dtype)

    def encode_prompt(self, prompt, prompt_lengths, *,
                      deterministic: bool = True):
        """Prompt mel -> cross-attention keys [B, S, C_hidden] + keep mask.

        Computed once per utterance at inference — the reference re-encodes
        the prompt inside every one of the ~31 solver calls
        (model3.py:902-914)."""
        prompt_keep = masking.sequence_mask(prompt_lengths, prompt.shape[1])
        prompt_h = self.prompt_encoder(prompt, prompt_lengths,
                                       deterministic=deterministic)
        prompt_h = prompt_h * prompt_keep.astype(prompt_h.dtype)[..., None]
        return prompt_h, prompt_keep

    def denoise(self, x, t, cond, prompt_h, prompt_keep, *, emb=None,
                deterministic: bool = True):
        """One UNet x0-prediction call given pre-encoded prompt keys.

        ``emb`` optionally injects the precomputed time+text embedding so
        the solver loop skips its recomputation every step."""
        h = jnp.concatenate([x, cond], axis=-1)
        return self.unet(h, t, prompt_h, encoder_attention_mask=prompt_keep,
                         emb=emb, deterministic=deterministic)

    def embed_time(self, timesteps):
        """Timestep-MLP embeddings [N, 4*ch0] for a batch of solver times."""
        return self.unet(None, timesteps, None, embedding_request="time")

    def embed_text(self, prompt_h):
        """Pooled 'text' additive embedding [B, 4*ch0] of the prompt keys."""
        return self.unet(None, None, prompt_h, embedding_request="text")

    def __call__(self, x, t, cond, prompt, cond_lengths, prompt_lengths, *,
                 deterministic: bool = True):
        """
        Args:
          x: [B, T, C_mel] noisy mel.
          t: [B] or scalar diffusion timesteps.
          cond: [B, T, C_hidden] content latent from the VITS prior.
          prompt: [B, S, C_mel] reference-audio prompt mel.
        Returns:
          [B, T, C_mel] x0 prediction.
        """
        prompt_h, prompt_keep = self.encode_prompt(
            prompt, prompt_lengths, deterministic=deterministic)
        return self.denoise(x, t, cond, prompt_h, prompt_keep,
                            deterministic=deterministic)
