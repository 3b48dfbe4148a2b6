"""Flash-attention routing: mask conversion, XLA-path parity, gating.

The fused kernel itself only runs on a real TPU (no interpret path in the
library); on the CPU test backend ``sdpa`` must fall back to the XLA
formulation bit-for-bit, and the -10000-bias -> keep-mask conversion must
reproduce the reference's additive-bias semantics
(unet_1d_condition.py:807-818) exactly for padded keys.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diff_vits_tpu.ops import flash_attention as FLA


def _rand_qkv(b=2, h=4, t=20, s=12, d=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    return q, k, v


def test_xla_sdpa_matches_manual_bias():
    q, k, v = _rand_qkv()
    keep = jnp.asarray([[True] * 9 + [False] * 3,
                        [True] * 12], dtype=bool)
    got = FLA.xla_sdpa(q, k, v, keep, sm_scale=8 ** -0.5)

    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) * 8 ** -0.5
    bias = jnp.where(keep, 0.0, -10000.0)[:, None, None, :]
    want = jnp.einsum("bhts,bhsd->bhtd",
                      jax.nn.softmax(scores + bias, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # masked keys receive (numerically) zero attention
    p = jax.nn.softmax(scores + bias, -1)
    assert float(jnp.abs(p[0, :, :, 9:]).max()) < 1e-40


def test_sdpa_falls_back_off_tpu():
    assert jax.default_backend() != "tpu"  # test suite forces CPU
    q, k, v = _rand_qkv()
    keep = jnp.ones((2, 12), bool)
    got = FLA.sdpa(q, k, v, keep, sm_scale=0.3, use_flash="auto")
    want = FLA.xla_sdpa(q, k, v, keep, sm_scale=0.3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # forcing flash on a non-TPU backend must still refuse
    assert not FLA.flash_ok(q.shape, k.shape, True)


def test_bias_to_keep_mask():
    bias = jnp.asarray([[[0.0, 0.0, -10000.0]],
                        [[0.0, -10000.0, -10000.0]]])  # [B, 1, S]
    keep = FLA.bias_to_keep_mask(bias)
    np.testing.assert_array_equal(
        np.asarray(keep), [[True, True, False], [True, False, False]])
    assert FLA.bias_to_keep_mask(None) is None


def test_pad_len():
    assert FLA._pad_len(1) == 128
    assert FLA._pad_len(128) == 128
    assert FLA._pad_len(601) == 640
    assert FLA._pad_len(400) == 512


def test_cross_attention_unchanged_on_cpu():
    """CrossAttention output is identical pre/post flash wiring on CPU."""
    from diff_vits_tpu.nn.unet1d import CrossAttention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 20, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
    bias = jnp.where(jnp.arange(12)[None, None, :] < 9, 0.0, -10000.0)
    bias = jnp.broadcast_to(bias, (2, 1, 12))
    m = CrossAttention(query_dim=32, heads=4, dim_head=8,
                       cross_attention_dim=16)
    params = m.init(jax.random.PRNGKey(0), x, ctx, bias)
    out_auto = m.apply(params, x, ctx, bias)
    m_off = CrossAttention(query_dim=32, heads=4, dim_head=8,
                           cross_attention_dim=16, use_flash=False)
    out_off = m_off.apply(params, x, ctx, bias)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_off))
