import numpy as np
import jax.numpy as jnp

from diff_vits_tpu.core import masking


def test_sequence_mask():
    lengths = jnp.array([1, 3, 5])
    m = masking.sequence_mask(lengths, 5)
    expect = np.array([[1, 0, 0, 0, 0], [1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_intersperse():
    assert masking.intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]


def test_generate_path():
    # durations [2, 1, 3] over Ty=6
    dur = jnp.array([[2, 1, 3]], dtype=jnp.float32)
    y_mask = masking.sequence_mask(jnp.array([6]), 6).astype(jnp.float32)
    x_mask = masking.sequence_mask(jnp.array([3]), 3).astype(jnp.float32)
    mask = y_mask[:, :, None] * x_mask[:, None, :]
    path = masking.generate_path(dur, mask)
    expect = np.array([
        [1, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [0, 0, 1],
        [0, 0, 1],
    ], np.float32)[None]
    np.testing.assert_array_equal(np.asarray(path), expect)


def test_generate_path_matches_reference():
    """Golden check vs commons.generate_path (reference, torch CPU)."""
    from tests.conftest import reference_available, add_reference_to_path
    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    import commons as ref_commons

    rng = np.random.default_rng(0)
    b, t_x, t_y = 3, 7, 19
    x_len = np.array([7, 4, 6])
    dur = np.zeros((b, t_x), np.float32)
    y_len = np.zeros(b, np.int64)
    for i in range(b):
        d = rng.integers(0, 4, size=x_len[i])
        dur[i, :x_len[i]] = d
        y_len[i] = d.sum()
    t_y = int(y_len.max())

    y_mask = masking.sequence_mask(jnp.asarray(y_len), t_y).astype(jnp.float32)
    x_mask = masking.sequence_mask(jnp.asarray(x_len), t_x).astype(jnp.float32)
    mask = y_mask[:, :, None] * x_mask[:, None, :]
    ours = np.asarray(masking.generate_path(jnp.asarray(dur), mask))

    t_dur = torch.tensor(dur)[:, None, :]  # [b, 1, t_x]
    # reference expects mask [b, 1, t_y, t_x] and returns path in that layout
    t_mask = torch.tensor(np.asarray(mask))[:, None]
    ref = ref_commons.generate_path(t_dur, t_mask).squeeze(1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_kl_loss_matches_reference():
    from tests.conftest import reference_available, add_reference_to_path
    if not reference_available():
        import pytest
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    import losses as ref_losses

    rng = np.random.default_rng(1)
    b, t, c = 2, 11, 8
    z_p = rng.normal(size=(b, t, c)).astype(np.float32)
    logs_q = rng.normal(size=(b, t, c)).astype(np.float32) * 0.1
    m_p = rng.normal(size=(b, t, c)).astype(np.float32)
    logs_p = rng.normal(size=(b, t, c)).astype(np.float32) * 0.1
    z_mask = np.asarray(masking.sequence_mask(jnp.array([11, 7]), t),
                        np.float32)[:, :, None]

    ours = float(masking.kl_loss(jnp.asarray(z_p), jnp.asarray(logs_q),
                                 jnp.asarray(m_p), jnp.asarray(logs_p),
                                 jnp.asarray(z_mask)))

    def t_(x):  # [B,T,C] -> [B,C,T]
        return torch.tensor(x).transpose(1, 2)

    ref = ref_losses.kl_loss(t_(z_p), t_(logs_q), t_(m_p), t_(logs_p),
                             torch.tensor(z_mask).transpose(1, 2)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
