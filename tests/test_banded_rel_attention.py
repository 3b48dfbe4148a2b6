"""Banded relative attention == the reference's full-width formulation.

The reference zero-pads its (2w+1)-entry rel-pos table to 2L-1 positions
and runs the skew trick on [L, 2L-1] tensors (attentions.py:240,272) — at
L=601, w=4 that is 99% zeros and 185 MB of reshape traffic per layer
(measured: 29% of the b=32 train step, docs/bench/trace_b32_r05.txt).
The banded path contracts only the 2w+1 live diagonals; every dropped
term is q . 0, so the two formulations are equal to float tolerance.
_rel_to_abs/_abs_to_rel/_get_relative_embeddings stay as the oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.nn.layers import (_abs_to_band, _abs_to_rel,
                                     _band_to_abs, _get_band_embeddings,
                                     _get_relative_embeddings, _rel_to_abs)


@pytest.mark.parametrize("l,w", [(12, 4), (5, 4), (4, 4), (3, 4), (2, 4),
                                 (1, 4), (16, 1), (7, 6), (601, 4)])
def test_key_side_banded_equals_full(l, w):
    rng = np.random.default_rng(l * 31 + w)
    b, h, d, g = 2, 2, 8, 1
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(g, 2 * w + 1, d)), jnp.float32)

    key_full = _get_relative_embeddings(emb, l, w)        # [g, 2l-1, d]
    full = _rel_to_abs(jnp.einsum("bhtd,gmd->bhtm", q, key_full))

    key_band = _get_band_embeddings(emb, l, w)
    band = _band_to_abs(jnp.einsum("bhtd,gmd->bhtm", q, key_band))

    assert band.shape == (b, h, l, l)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("l,w", [(12, 4), (5, 4), (4, 4), (3, 4), (2, 4),
                                 (1, 4), (16, 1), (7, 6), (601, 4)])
def test_value_side_banded_equals_full(l, w):
    rng = np.random.default_rng(l * 37 + w)
    b, h, d, g = 2, 2, 8, 1
    p = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, h, l, l)), jnp.float32), axis=-1)
    emb = jnp.asarray(rng.normal(size=(g, 2 * w + 1, d)), jnp.float32)

    val_full = _get_relative_embeddings(emb, l, w)
    full = jnp.einsum("bhtm,gmd->bhtd", _abs_to_rel(p), val_full)

    w_eff = min(w, l - 1)
    val_band = _get_band_embeddings(emb, l, w)
    band = jnp.einsum("bhtm,gmd->bhtd", _abs_to_band(p, w_eff), val_band)

    assert band.shape == full.shape
    np.testing.assert_allclose(np.asarray(band), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_band_to_abs_places_diagonals():
    """Hand-checkable placement: band[t, j] lands at [t, t + j - w]."""
    l, w = 5, 2
    band = jnp.arange(l * (2 * w + 1), dtype=jnp.float32).reshape(
        1, 1, l, 2 * w + 1) + 1.0
    out = np.asarray(_band_to_abs(band))[0, 0]
    for t in range(l):
        for s in range(l):
            j = s - t + w
            want = band[0, 0, t, j] if 0 <= j <= 2 * w else 0.0
            assert out[t, s] == want, (t, s)


def test_abs_to_band_extracts_diagonals():
    l, w = 6, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 1, l, l)), jnp.float32)
    out = np.asarray(_abs_to_band(x, w))[0, 0]
    for t in range(l):
        for j in range(2 * w + 1):
            s = t + j - w
            want = x[0, 0, t, s] if 0 <= s < l else 0.0
            assert out[t, j] == pytest.approx(float(want)), (t, j)
