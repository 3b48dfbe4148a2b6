"""Vocoder tests: ISTFT round-trip vs torch.istft, full model smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from diff_vits_tpu.models.vocoder import Vocos, istft


def test_istft_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 256 * 40)).astype(np.float32) * 0.1

    spec_t = torch.stft(torch.tensor(audio), n_fft=1024, hop_length=256,
                        window=torch.hann_window(1024), center=True,
                        return_complex=True)
    rec_t = torch.istft(spec_t, n_fft=1024, hop_length=256,
                        window=torch.hann_window(1024), center=True,
                        length=audio.shape[-1]).numpy()

    spec_np = spec_t.numpy().transpose(0, 2, 1)  # [B, F, freq]
    rec_j = np.asarray(istft(jnp.asarray(spec_np.real),
                             jnp.asarray(spec_np.imag), 1024, 256,
                             length=audio.shape[-1]))
    np.testing.assert_allclose(rec_j, rec_t, atol=1e-4)
    np.testing.assert_allclose(rec_t, audio, atol=1e-4)  # sanity round-trip


def test_vocos_shapes():
    model = Vocos(n_mels=100)
    mel = jnp.zeros((1, 50, 100), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    audio = model.apply(params, mel)
    # center ISTFT of T frames reconstructs (T-1)*hop samples
    assert audio.shape == (1, 49 * 256)
    assert np.isfinite(np.asarray(audio)).all()
