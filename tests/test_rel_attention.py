"""Parity: Pallas fused rel-pos self-attention vs the XLA formulation.

Both paths share one parameter tree (holders mirror nn.Dense / the rel
tables exactly), so a single init serves both. On CPU the kernel runs in
Pallas interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.nn import layers as L


def _mha(use_fused, **over):
    kw = dict(channels=64, out_channels=64, n_heads=2, window_size=4,
              use_fused=use_fused)
    kw.update(over)
    return L.MultiHeadAttention(**kw)


def _data(b=2, t=37, c=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    lengths = jnp.asarray([t, t - 9][:b], jnp.int32)
    keep = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)
    attn_mask = (keep[:, :, None] * keep[:, None, :])[:, None]  # [B,1,T,T]
    return x, attn_mask


def test_param_tree_identical():
    x, m = _data()
    p_ref = _mha(False).init(jax.random.PRNGKey(0), x, x, m)
    p_fused = _mha(True).init(jax.random.PRNGKey(0), x, x, m)
    ref_tree = jax.tree_util.tree_structure(p_ref)
    assert ref_tree == jax.tree_util.tree_structure(p_fused)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("t", [7, 37, 130])
def test_fused_matches_xla(t):
    x, m = _data(t=t)
    params = _mha(False).init(jax.random.PRNGKey(1), x, x, m)
    ref = _mha(False).apply(params, x, x, m)
    fused = _mha(True).apply(params, x, x, m)
    # compare only unmasked rows (masked rows are undefined downstream)
    keep = np.asarray(m[:, 0, :, 0]) > 0
    np.testing.assert_allclose(np.asarray(fused)[keep],
                               np.asarray(ref)[keep], atol=2e-5, rtol=2e-4)


def test_fused_matches_xla_no_mask():
    x, _ = _data(t=25)
    params = _mha(False).init(jax.random.PRNGKey(2), x, x, None)
    ref = _mha(False).apply(params, x, x, None)
    fused = _mha(True).apply(params, x, x, None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_gate_falls_back():
    """Cross-attention / training / exotic options stay on the XLA path."""
    x, m = _data(t=16)
    c2 = x + 1.0
    mod = _mha(True)
    params = mod.init(jax.random.PRNGKey(3), x, x, m)
    # cross-attention (x is not c) must not take the fused path: it still
    # runs (XLA path supports it) and differs from self-attention output
    out_cross = mod.apply(params, x, c2, m)
    out_self = mod.apply(params, x, x, m)
    assert not np.allclose(np.asarray(out_cross), np.asarray(out_self))
    # proximal_bias forces XLA path even with use_fused=True
    mod_px = _mha(True, proximal_bias=True)
    p_px = mod_px.init(jax.random.PRNGKey(4), x, x, m)
    mod_px.apply(p_px, x, x, m)  # must not raise
