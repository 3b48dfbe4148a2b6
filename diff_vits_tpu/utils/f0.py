"""F0 extraction / interpolation / coarse quantization utilities.

Capability parity with the reference's sovits-era helpers (utils.py:82-206:
crepe/parselmouth/dio extractors + interpolate_f0 + f0_to_coarse). Those are
unused by the active training path (SURVEY.md §2.8); we provide a
dependency-free autocorrelation (YIN-style) extractor plus the same
interpolation/quantization interfaces.
"""
from __future__ import annotations

import numpy as np

f0_bin = 256
f0_max = 1100.0
f0_min = 50.0
f0_mel_min = 1127 * np.log(1 + f0_min / 700)
f0_mel_max = 1127 * np.log(1 + f0_max / 700)


def compute_f0(wav: np.ndarray, sampling_rate: int = 24000,
               hop_length: int = 256, fmin: float = f0_min,
               fmax: float = f0_max, threshold: float = 0.3) -> np.ndarray:
    """Frame-wise f0 via normalized autocorrelation (0 = unvoiced)."""
    frame_len = int(sampling_rate // fmin) * 2
    n_frames = max(1, 1 + (len(wav) - frame_len) // hop_length) \
        if len(wav) >= frame_len else 1
    wav = np.pad(wav, (0, max(0, frame_len + n_frames * hop_length - len(wav))))
    lag_min = int(sampling_rate / fmax)
    lag_max = int(sampling_rate / fmin)
    f0 = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        frame = wav[i * hop_length:i * hop_length + frame_len]
        frame = frame - frame.mean()
        energy = float(frame @ frame)
        if energy < 1e-8:
            continue
        corr = np.correlate(frame, frame, mode="full")[frame_len - 1:]
        corr = corr / (corr[0] + 1e-12)
        seg = corr[lag_min:lag_max]
        if seg.size == 0:
            continue
        lag = int(np.argmax(seg)) + lag_min
        if corr[lag] > threshold:
            f0[i] = sampling_rate / lag
    return f0


def interpolate_f0(f0: np.ndarray):
    """Linear-interpolate unvoiced gaps (utils.py:82-120 semantics).

    Returns (interpolated_f0, voiced_mask).
    """
    f0 = np.asarray(f0, np.float32).copy()
    vuv = (f0 > 0).astype(np.float32)
    voiced = np.where(f0 > 0)[0]
    if voiced.size == 0:
        return f0, vuv
    idx = np.arange(len(f0))
    f0 = np.interp(idx, voiced, f0[voiced]).astype(np.float32)
    return f0, vuv


def f0_to_coarse(f0: np.ndarray) -> np.ndarray:
    """Quantize f0 to [1, 255] mel-spaced bins (utils.py f0_to_coarse)."""
    f0 = np.asarray(f0, np.float64)
    f0_mel = 1127 * np.log(1 + f0 / 700)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = np.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = np.clip(f0_mel, 1, f0_bin - 1)
    coarse = np.rint(f0_mel).astype(np.int64)
    coarse[f0 == 0] = 1
    return coarse
