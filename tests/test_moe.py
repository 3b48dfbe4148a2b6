"""MoE feed-forward + expert parallelism: oracle and sharded-run parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diff_vits_tpu.parallel.moe import MoEFeedForward, expert_sharding_rules


def _gelu(x):
    from scipy.stats import norm  # exact (non-tanh) gelu
    return x * norm.cdf(x)


def test_moe_matches_per_token_oracle():
    rng = np.random.default_rng(0)
    b, t, d, e, k = 2, 6, 8, 4, 2
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    m = MoEFeedForward(d, e, top_k=k)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    gate = x @ np.asarray(params["gate"]["kernel"])
    w1 = np.asarray(params["w1"]); b1 = np.asarray(params["b1"])
    w2 = np.asarray(params["w2"]); b2 = np.asarray(params["b2"])
    want = np.zeros_like(got)
    for bi in range(b):
        for ti in range(t):
            logits = gate[bi, ti]
            idx = np.argsort(logits)[::-1][:k]
            w = np.exp(logits[idx] - logits[idx].max())
            w = w / w.sum()
            for wi, ei in zip(w, idx):
                u = x[bi, ti] @ w1[ei] + b1[ei]
                a, g = np.split(u, 2)
                y = (a * _gelu(g)) @ w2[ei] + b2[ei]
                want[bi, ti] += wi * y
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_expert_sharded_matches_unsharded():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(1)
    b, t, d, e = 2, 6, 8, 8
    x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    m = MoEFeedForward(d, e, top_k=2)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    want = m.apply({"params": params}, x)

    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))
    p_sh = expert_sharding_rules(mesh, params)
    params_sharded = jax.device_put(params, p_sh)
    got = jax.jit(lambda p, x: m.apply({"params": p}, x),
                  in_shardings=(p_sh, None))(params_sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # the expert kernels really are scattered e/4 per device
    shard = jax.tree_util.tree_leaves(params_sharded)[-1]
    assert params["w1"].shape[0] == e


def test_transformer_block_moe_option():
    from diff_vits_tpu.nn.unet1d import BasicTransformerBlock
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    blk = BasicTransformerBlock(16, 2, 8, moe_experts=4)
    y, _ = blk.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))
