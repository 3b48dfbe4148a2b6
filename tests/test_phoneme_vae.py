"""Phoneme VAE (bv2 variant) unit tests."""
import numpy as np
import jax
import jax.numpy as jnp

from diff_vits_tpu.core import masking
from diff_vits_tpu.models.phoneme_vae import (
    PhonemeVAE,
    expand_by_alignment,
    group_by_alignment,
)


def _alignment(t_y, t_x, durs):
    attn = np.zeros((1, t_y, t_x), np.float32)
    pos = 0
    for x, d in enumerate(durs):
        attn[0, pos:pos + d, x] = 1.0
        pos += d
    return jnp.asarray(attn)


def test_group_and_expand_roundtrip():
    durs = [2, 3, 1]
    t_y, t_x = 6, 3
    attn = _alignment(t_y, t_x, durs)
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, t_y, 4)).astype(np.float32))
    pooled = group_by_alignment(z, attn)
    # segment means
    np.testing.assert_allclose(np.asarray(pooled[0, 0]),
                               np.asarray(z[0, :2].mean(0)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled[0, 2]),
                               np.asarray(z[0, 5]), rtol=1e-5)
    expanded = expand_by_alignment(pooled, attn)
    assert expanded.shape == z.shape
    np.testing.assert_allclose(np.asarray(expanded[0, 0]),
                               np.asarray(expanded[0, 1]), rtol=1e-6)


def test_phoneme_vae_forward_and_infer():
    c_inter, c_hidden = 8, 16
    t_y, t_x, b = 12, 4, 1
    vae = PhonemeVAE(c_inter, c_hidden)
    attn = _alignment(t_y, t_x, [3, 3, 3, 3])
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(b, t_y, c_inter)).astype(np.float32))
    x_h = jnp.asarray(rng.normal(size=(b, t_x, c_hidden)).astype(np.float32))
    x_mask = jnp.ones((b, t_x, 1), jnp.float32)

    key = jax.random.PRNGKey(0)
    (prosody, loss_kl_ph), params = vae.init_with_output(
        {"params": key}, z, attn, x_h, x_mask, noise_key=key)
    assert prosody.shape == z.shape
    assert np.isfinite(float(loss_kl_ph))

    out = vae.apply(params, attn, x_h, x_mask, noise_key=key,
                    method=PhonemeVAE.infer)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()
