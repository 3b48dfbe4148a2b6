"""Vocos-style mel -> waveform vocoder (ConvNeXt backbone + ISTFT head).

The reference delegates waveform synthesis to the pretrained torch Vocos
(``Vocos.from_pretrained("charactr/vocos-mel-24khz")``, model3.py:1293).
For a self-contained TPU stack we implement the same architecture in linen —
ConvNeXt blocks + an ISTFT head (mag/phase prediction, hann overlap-add) —
and a converter that loads the published torch checkpoint's weights.

Architecture constants follow the published vocos-mel-24khz config:
  input 100 mel bins -> embed conv k7 -> 8 ConvNeXt blocks (dim 512,
  intermediate 1536, layer-scale 1/8) -> LN -> Linear(512, n_fft + 2)
  -> exp(mag, clipped) * exp(i*phase) -> ISTFT(n_fft 1024, hop 256, center).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diff_vits_tpu.ops.stft import hann_window


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init: float = 1.0 / 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]
        residual = x
        h = jnp.pad(x, ((0, 0), (3, 3), (0, 0)))
        h = nn.Conv(self.dim, (7,), padding="VALID",
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.intermediate_dim, dtype=self.dtype,
                     name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return residual + gamma * h


def _irfft_real(real: jax.Array, imag: jax.Array, n_fft: int) -> jax.Array:
    """IRFFT via real matmuls (cos/sin synthesis bases).

    The TPU backend here lacks complex arithmetic; the inverse DFT of a
    hermitian half-spectrum is two [F, K+1] @ [K+1, n_fft] matmuls — which
    the MXU prefers over an FFT butterfly at these sizes anyway.
    """
    k = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32)
    n = jnp.arange(n_fft, dtype=jnp.float32)
    ang = 2.0 * jnp.pi * k[:, None] * n[None, :] / n_fft  # [K+1, N]
    # hermitian weights: DC and nyquist count once, the rest twice
    w = jnp.full((n_fft // 2 + 1, 1), 2.0, jnp.float32)
    w = w.at[0].set(1.0).at[-1].set(1.0)
    cos_b = jnp.cos(ang) * w / n_fft
    sin_b = jnp.sin(ang) * w / n_fft
    return real @ cos_b - imag @ sin_b


def istft(real: jax.Array, imag: jax.Array, n_fft: int = 1024,
          hop_length: int = 256,
          length: Optional[int] = None) -> jax.Array:
    """Inverse STFT with hann window and window-envelope normalization.

    real/imag: [B, frames, n_fft//2+1]. Matches torch.istft(center=True).
    """
    window = jnp.asarray(hann_window(n_fft))
    frames = _irfft_real(real, imag, n_fft)  # [B, F, n_fft]
    frames = frames * window
    b, n_frames, _ = frames.shape
    out_len = n_fft + hop_length * (n_frames - 1)

    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    audio = jnp.zeros((b, out_len), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1))
    env = jnp.zeros((out_len,), frames.dtype).at[idx].add(
        jnp.tile(window ** 2, n_frames))
    audio = audio / jnp.maximum(env, 1e-11)

    pad = n_fft // 2
    audio = audio[:, pad:out_len - pad]
    if length is not None:
        audio = audio[:, :length]
    return audio


class Vocos(nn.Module):
    """mel [B, T, n_mels] -> waveform [B, T * hop]."""
    n_mels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        h = jnp.pad(mel, ((0, 0), (3, 3), (0, 0)))
        h = nn.Conv(self.dim, (7,), padding="VALID", dtype=self.dtype,
                    name="embed")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        for i in range(self.num_layers):
            h = ConvNeXtBlock(self.dim, self.intermediate_dim,
                              dtype=self.dtype,
                              name=f"convnext_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_norm")(h)
        h = nn.Dense(self.n_fft + 2, dtype=self.dtype, name="out")(h)
        mag, phase = jnp.split(h, 2, axis=-1)
        # clip AFTER exp (torch Vocos: clip(exp(x), max=1e2)) — clipping the
        # log-magnitude would cap at e^100 and blow up on out-of-dist frames
        mag = jnp.clip(jnp.exp(mag.astype(jnp.float32)), max=1e2)
        phase = phase.astype(jnp.float32)
        # center ISTFT of T frames yields (T-1)*hop samples
        return istft(mag * jnp.cos(phase), mag * jnp.sin(phase),
                     self.n_fft, self.hop_length)


def load_vocoder(cfg, ckpt_path: Optional[str] = None):
    """Build a Vocos module + params for serving.

    ``ckpt_path`` may be a torch state_dict (.bin/.pt/.pth — converted on
    the fly, e.g. the published charactr/vocos-mel-24khz pytorch_model.bin)
    or one of our checkpoints. With no path the vocoder is random-init
    (audio will be noise; useful for pipeline tests only).
    Returns (module, params).
    """
    voc = Vocos(n_mels=cfg.data.n_mel_channels,
                n_fft=cfg.data.window_size,
                hop_length=cfg.data.hop_length)
    if ckpt_path:
        if ckpt_path.endswith((".bin", ".pt", ".pth")):
            import torch
            sd = torch.load(ckpt_path, map_location="cpu",
                            weights_only=True)
            sd = {k: v.numpy() for k, v in sd.items()}
            params = convert_torch_vocos(sd)
        else:
            from diff_vits_tpu.train import checkpoint as ckpt_lib
            _, saved = ckpt_lib.load_checkpoint(ckpt_path)
            params = saved["params"] if "params" in saved else saved
    else:
        params = voc.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, cfg.data.n_mel_channels),
                      jnp.float32))["params"]
    return voc, params


def convert_torch_vocos(state_dict) -> dict:
    """Convert a torch Vocos (charactr/vocos-mel-24khz) state_dict into our
    linen params tree."""
    from diff_vits_tpu.utils import transplant as tp

    p = {
        "embed": tp.conv1d(state_dict, "backbone.embed"),
        "norm": tp.layernorm(state_dict, "backbone.norm"),
        "final_norm": tp.layernorm(state_dict, "backbone.final_layer_norm"),
        "out": tp.dense_from_linear(state_dict, "head.out"),
    }
    i = 0
    while f"backbone.convnext.{i}.dwconv.weight" in state_dict:
        blk = f"backbone.convnext.{i}"
        p[f"convnext_{i}"] = {
            "dwconv": tp.conv1d(state_dict, f"{blk}.dwconv"),
            "norm": tp.layernorm(state_dict, f"{blk}.norm"),
            "pwconv1": tp.dense_from_linear(state_dict, f"{blk}.pwconv1"),
            "pwconv2": tp.dense_from_linear(state_dict, f"{blk}.pwconv2"),
            "gamma": tp._get(state_dict, f"{blk}.gamma"),
        }
        i += 1
    return p
