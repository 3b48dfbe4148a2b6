"""Sequence-parallel (ring) attention and FSDP sharding on the 8-device
virtual CPU mesh (SURVEY.md §5.7: the scaling machinery the reference
lacks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diff_vits_tpu.ops.attention import scaled_dot_product_attention
from diff_vits_tpu.parallel.ring_attention import make_ring_attention
from diff_vits_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _mesh(names, shape):
    return Mesh(mesh_utils.create_device_mesh(shape), names)


def test_ring_attention_matches_full():
    mesh = _mesh(("seq",), (8,))
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    keep = np.ones((b, t), bool)
    keep[0, 50:] = False
    keep[1, 37:] = False
    keep = jnp.asarray(keep)

    ref = scaled_dot_product_attention(q, k, v,
                                       mask=keep[:, None, None, :])
    fn = jax.jit(make_ring_attention(mesh, "seq"))
    out = fn(q, k, v, keep)
    # padded query rows attend nothing in ref (zeroed) — compare valid rows
    np.testing.assert_allclose(np.asarray(out)[:, :, :37],
                               np.asarray(ref)[:, :, :37], atol=1e-5)
    # query rows beyond a batch item's length still see the same keys
    np.testing.assert_allclose(np.asarray(out)[0, :, :50],
                               np.asarray(ref)[0, :, :50], atol=1e-5)


def test_ring_attention_no_mask():
    mesh = _mesh(("seq",), (8,))
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 40, 8
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    keep = jnp.ones((b, t), bool)
    ref = scaled_dot_product_attention(q, k, v)
    out = jax.jit(make_ring_attention(mesh, "seq"))(q, k, v, keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fsdp_sharding_rules_scatter_large_kernels():
    mesh = _mesh(("data", "fsdp"), (2, 4))
    params = {
        "big": {"kernel": jnp.zeros((256, 512))},
        "tiny": {"kernel": jnp.zeros((4, 4))},
        "odd": {"kernel": jnp.zeros((7, 13))},  # not divisible by 4
    }
    sh = mesh_lib.state_sharding_rules(mesh, params, min_size=0)
    assert sh["big"]["kernel"].spec == P("fsdp", None)
    assert sh["odd"]["kernel"].spec in (P(), P(None, None))
    # divisible only on the last dim -> falls through to it
    p2 = {"x": {"kernel": jnp.zeros((7, 8))}}
    sh2 = mesh_lib.state_sharding_rules(mesh, p2, min_size=0)
    assert sh2["x"]["kernel"].spec == P(None, "fsdp")


def test_fsdp_composes_with_tp():
    mesh = _mesh(("data", "fsdp", "model"), (2, 2, 2))
    params = {"attn": {"to_q": {"kernel": jnp.zeros((64, 64))}}}
    sh = mesh_lib.state_sharding_rules(mesh, params, min_size=0)
    # column-TP takes the output dim; fsdp scatters the input dim
    assert sh["attn"]["to_q"]["kernel"].spec == P("fsdp", "model")


def test_fsdp_train_state_end_to_end():
    """One optimizer step with params scattered over 'fsdp' executes and
    matches the replicated result."""
    import optax

    mesh = _mesh(("data", "fsdp"), (2, 4))
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    params = {"dense": {"kernel": w}}
    tx = optax.adamw(1e-2)

    def loss_fn(p, x, y):
        return jnp.mean((x @ p["dense"]["kernel"] - y) ** 2)

    def step(p, opt, x, y):
        g = jax.grad(loss_fn)(p, x, y)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt

    # replicated baseline
    p_ref, _ = step(params, tx.init(params), x, y)

    sh = mesh_lib.state_sharding_rules(mesh, params, min_size=0)
    assert sh["dense"]["kernel"].spec == P("fsdp", None)
    data_sh = NamedSharding(mesh, P("data"))
    p_sh = jax.device_put(params, sh)
    opt_sh = jax.device_put(tx.init(params), mesh_lib.state_sharding_rules(
        mesh, tx.init(params), min_size=0))
    stepped = jax.jit(step, in_shardings=(sh, None, data_sh, data_sh),
                      out_shardings=(sh, None))
    p_out, _ = stepped(p_sh, opt_sh, jax.device_put(x, data_sh),
                       jax.device_put(y, data_sh))
    np.testing.assert_allclose(np.asarray(p_out["dense"]["kernel"]),
                               np.asarray(p_ref["dense"]["kernel"]),
                               atol=1e-5)


def test_ring_attention_is_trainable():
    """The ring is a lax.scan (reverse-mode differentiable): grads through
    the sharded ring match grads of full attention."""
    mesh = _mesh(("seq",), (8,))
    rng = np.random.default_rng(2)
    b, h, t, d = 1, 2, 32, 8
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    keep = jnp.ones((b, t), bool)

    ring = make_ring_attention(mesh, "seq")
    g_ring = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ring(q, k, v, keep) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(
            scaled_dot_product_attention(q, k, v) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
