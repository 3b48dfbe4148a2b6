"""STFT/mel parity vs torch.stft + the documented torchaudio mel formula."""
import numpy as np
import jax.numpy as jnp
import pytest

from diff_vits_tpu.ops import stft

from tests.conftest import reference_available


def test_stft_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 24000)).astype(np.float32) * 0.1

    ours = np.asarray(stft.stft_magnitude(jnp.asarray(audio)))  # [B, F, n_freq]

    t = torch.stft(torch.tensor(audio), n_fft=1024, hop_length=256,
                   window=torch.hann_window(1024), center=True,
                   pad_mode="reflect", return_complex=True)
    ref = t.abs().numpy().transpose(0, 2, 1)  # [B, frames, freqs]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mel_filterbank_properties():
    fb = stft.mel_filterbank(24000, 1024, 100)
    assert fb.shape == (513, 100)
    assert (fb >= 0).all()
    # every mel bin has some support
    assert (fb.sum(0) > 0).all()


def test_log_mel_shape():
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 256 * 100)).astype(np.float32) * 0.1
    mel = stft.log_mel_spectrogram(jnp.asarray(audio))
    assert mel.shape == (1, 101, 100)
    assert np.isfinite(np.asarray(mel)).all()
