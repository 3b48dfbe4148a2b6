"""GPipe pipeline parallelism: matches the sequential layer stack."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diff_vits_tpu.parallel.pipeline import make_pipeline


def layer_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


@pytest.fixture(scope="module")
def mesh_stage():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.array(jax.devices()[:4]), ("stage",))


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(mesh_stage, n_micro):
    rng = np.random.default_rng(0)
    n_layers, d, b = 8, 16, 8
    params = {
        "w": jnp.asarray(rng.normal(size=(n_layers, d, d)) * 0.3,
                         jnp.float32),
        "b": jnp.asarray(rng.normal(size=(n_layers, d)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    def sequential(params, x):
        def body(h, p):
            return layer_fn(p, h), None
        return jax.lax.scan(body, x, params)[0]

    want = sequential(params, x)
    fn = jax.jit(make_pipeline(layer_fn, mesh_stage, n_microbatches=n_micro))
    got = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_bad_shapes(mesh_stage):
    params = {"w": jnp.zeros((6, 4, 4)), "b": jnp.zeros((6, 4))}
    fn = make_pipeline(layer_fn, mesh_stage, n_microbatches=4)
    with pytest.raises(ValueError):
        fn(params, jnp.zeros((8, 4)))  # 6 layers over 4 stages
    params = {"w": jnp.zeros((8, 4, 4)), "b": jnp.zeros((8, 4))}
    with pytest.raises(ValueError):
        fn(params, jnp.zeros((6, 4)))  # batch 6 over 4 microbatches
