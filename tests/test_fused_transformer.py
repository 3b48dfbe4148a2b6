"""Fused Pallas transformer kernels vs the XLA formulation.

The fused path (ops/fused_transformer.py) must be numerically equivalent to
the unfused BasicTransformerBlock: identical parameter trees, same LN /
SDPA / GEGLU math. On CPU the kernels run in Pallas interpret mode with
fp32 compute, so agreement is tight.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diff_vits_tpu.nn import unet1d as U

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("t,s,c,heads", [(37, 23, 64, 8), (64, 24, 32, 4)])
def test_fused_block_matches_unfused(t, s, c, heads):
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, s, 16)).astype(np.float32))
    keep = np.ones((b, s), np.float32)
    keep[1, s - 5:] = 0.0
    ctx_bias = jnp.asarray(((1 - keep) * -10000.0)[:, None, :])

    kw = dict(dim=c, num_heads=heads, head_dim=c // heads,
              cross_attention_dim=16)
    ref_block = U.BasicTransformerBlock(use_fused=False, **kw)
    params = ref_block.init(jax.random.PRNGKey(0), x, ctx, None, ctx_bias)
    out_ref = ref_block.apply(params, x, ctx, None, ctx_bias)

    fused_block = U.BasicTransformerBlock(use_fused=True, **kw)
    # identical parameter trees: fused init must accept unfused params
    out_fused = fused_block.apply(params, x, ctx, None, ctx_bias)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_param_tree_identical():
    c, heads = 32, 4
    x = jnp.zeros((1, 8, c))
    ctx = jnp.zeros((1, 6, 16))
    kw = dict(dim=c, num_heads=heads, head_dim=c // heads,
              cross_attention_dim=16)
    p_ref = U.BasicTransformerBlock(use_fused=False, **kw).init(
        jax.random.PRNGKey(1), x, ctx)
    p_fused = U.BasicTransformerBlock(use_fused=True, **kw).init(
        jax.random.PRNGKey(1), x, ctx)
    ref_paths = jax.tree_util.tree_structure(p_ref)
    fused_paths = jax.tree_util.tree_structure(p_fused)
    assert ref_paths == fused_paths
    # same initializer draws (paths drive flax RNG folding)
    for (kp, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb),
                                      err_msg=str(kp))


def test_fused_self_only_block():
    # no cross-attention dim -> self-attn + FF only
    rng = np.random.default_rng(2)
    b, t, c, heads = 1, 40, 32, 4
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    kw = dict(dim=c, num_heads=heads, head_dim=c // heads)
    ref_block = U.BasicTransformerBlock(use_fused=False, **kw)
    params = ref_block.init(jax.random.PRNGKey(3), x)
    out_ref = ref_block.apply(params, x)
    out_fused = U.BasicTransformerBlock(use_fused=True, **kw).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_block_grad_matches_xla():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from diff_vits_tpu.nn.unet1d import BasicTransformerBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 7, 16)), jnp.float32)
    kw = dict(dim=32, num_heads=4, head_dim=8, cross_attention_dim=16)
    params = BasicTransformerBlock(use_fused=False, **kw).init(
        jax.random.PRNGKey(0), x, ctx)

    def loss(m):
        def f(p):
            y = BasicTransformerBlock(use_fused=m, **kw).apply(p, x, ctx)
            return jnp.sum(y ** 2)
        return f

    g_ref = jax.grad(loss(False))(params)
    g_fused = jax.grad(loss(True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)
