"""F0 utilities (utils.py:82-206 parity: dio-style extraction, interp,
coarse quantization)."""
import numpy as np

from diff_vits_tpu.utils.f0 import compute_f0, f0_to_coarse, interpolate_f0


def test_compute_f0_sine():
    sr = 24000
    t = np.arange(sr * 2) / sr
    freq = 220.0
    wav = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    f0 = compute_f0(wav, sampling_rate=sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > len(f0) // 2
    assert abs(np.median(voiced) - freq) < 15.0  # within ~a semitone


def test_interpolate_fills_unvoiced():
    f0 = np.array([0.0, 0.0, 100.0, 0.0, 200.0, 0.0], np.float32)
    interp, uv = interpolate_f0(f0)
    assert (interp > 0).all()
    assert uv.dtype == np.float32 or uv.dtype == bool or uv.ndim == 1
    # voiced frames unchanged
    assert interp[2] == 100.0 and interp[4] == 200.0


def test_f0_to_coarse_range():
    f0 = np.linspace(0, 1000, 256).astype(np.float32)
    coarse = f0_to_coarse(f0)
    assert coarse.min() >= 1 and coarse.max() <= 255
    # monotone non-decreasing over voiced range
    v = coarse[1:]
    assert (np.diff(v.astype(int)) >= 0).all()
