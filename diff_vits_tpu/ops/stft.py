"""STFT / mel-spectrogram feature extraction in pure jnp.

Replaces the reference's torchaudio transforms (preprocess.py:45-66,
tts_infer.py:57-67). Constants are part of the model contract and must match
the torchaudio defaults exactly:
  n_fft 1024, hop 256, win 1024, periodic Hann, center + reflect pad,
  power=1 magnitude; mel: 100 bins, f_min 0, f_max sr/2, HTK scale, no norm;
  finally log(clip(x, 1e-7)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 * (1 - np.cos(2 * np.pi * n / win_length))).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], HTK scale, no norm.

    Matches ``torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk')`` which the reference's MelSpectrogram uses by default.
    """
    f_max = f_max if f_max is not None else sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                             "center"))
def stft_magnitude(audio: jax.Array, n_fft: int = 1024, hop_length: int = 256,
                   win_length: int | None = None, center: bool = True) -> jax.Array:
    """Power-1 magnitude STFT.

    Args:
      audio: [..., T] waveform.
    Returns:
      [..., frames, n_freqs] magnitudes (channel-last: frequency on lanes).
    """
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                        mode="reflect")
    n_frames = 1 + (audio.shape[-1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = audio[..., idx] * window  # [..., frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec)


def log_mel_spectrogram(audio: jax.Array, sr: int = 24000, n_fft: int = 1024,
                        hop_length: int = 256, n_mels: int = 100,
                        f_min: float = 0.0, f_max: float | None = None,
                        clip_val: float = 1e-7) -> jax.Array:
    """log(clip(mel, 1e-7)) features, [..., frames, n_mels].

    Parity: preprocess.py:44-55 / tts_infer.py:57-67 (the checkpoint-compat
    feature space).
    """
    mag = stft_magnitude(audio, n_fft=n_fft, hop_length=hop_length)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, f_min, f_max))
    mel = mag @ fb  # [..., frames, n_mels]
    return jnp.log(jnp.clip(mel, min=clip_val))


def log_linear_spectrogram(audio: jax.Array, n_fft: int = 1024,
                           hop_length: int = 256,
                           clip_val: float = 1e-7) -> jax.Array:
    """log power-1 linear spectrogram [..., frames, n_fft//2+1].

    Parity: preprocess.py:57-66 (.spec.pt features).
    """
    mag = stft_magnitude(audio, n_fft=n_fft, hop_length=hop_length)
    return jnp.log(jnp.clip(mag, min=clip_val))
