"""Parity: Pallas fused ResnetBlock vs the XLA formulation (shared params).
Interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.nn import unet1d as U

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


def _data(b=2, t=50, ci=64, te=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, ci)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(b, te)), jnp.float32)
    return x, temb


@pytest.mark.parametrize("ci,co", [(64, 64), (64, 96)])
def test_fused_matches_xla(ci, co):
    x, temb = _data(ci=ci)
    kw = dict(in_channels=ci, out_channels=co, groups=32)
    params = U.ResnetBlock1D(use_fused=False, **kw).init(
        jax.random.PRNGKey(0), x, temb)
    ref = U.ResnetBlock1D(use_fused=False, **kw).apply(params, x, temb)
    fused = U.ResnetBlock1D(use_fused=True, **kw).apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=3e-5, rtol=3e-4)


def test_param_tree_identical():
    x, temb = _data(ci=64)
    kw = dict(in_channels=64, out_channels=96)
    p_ref = U.ResnetBlock1D(use_fused=False, **kw).init(
        jax.random.PRNGKey(1), x, temb)
    p_fused = U.ResnetBlock1D(use_fused=True, **kw).init(
        jax.random.PRNGKey(1), x, temb)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_fused))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_path_stays_xla():
    """Non-deterministic (training) calls never take the fused path —
    gradients flow through the XLA formulation."""
    x, temb = _data(ci=64)
    kw = dict(in_channels=64, out_channels=64, dropout=0.1)
    mod = U.ResnetBlock1D(use_fused=True, **kw)
    params = mod.init(jax.random.PRNGKey(2), x, temb)

    def loss(p):
        out = mod.apply(p, x, temb, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_fused_grad_matches_xla():
    # the fused op's custom VJP recomputes through the XLA twin, so grads
    # through the fused route equal grads of the XLA formulation
    x, temb = _data()
    kw = dict(in_channels=64, out_channels=96, groups=32)
    params = U.ResnetBlock1D(use_fused=False, **kw).init(
        jax.random.PRNGKey(0), x, temb)

    def loss(m):
        def f(p):
            y = U.ResnetBlock1D(use_fused=m, **kw).apply(p, x, temb)
            return jnp.sum(y ** 2)
        return f

    g_ref = jax.grad(loss(False))(params)
    g_fused = jax.grad(loss(True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)
