"""RQ spline parity vs the reference transforms.py + round-trip checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from diff_vits_tpu.ops import spline

from tests.conftest import reference_available, add_reference_to_path


def _random_params(rng, shape, num_bins):
    w = rng.normal(size=shape + (num_bins,)).astype(np.float32)
    h = rng.normal(size=shape + (num_bins,)).astype(np.float32)
    d = rng.normal(size=shape + (num_bins - 1,)).astype(np.float32)
    return w, h, d


def test_roundtrip_and_logdet():
    rng = np.random.default_rng(0)
    shape = (2, 3, 17)
    num_bins = 10
    w, h, d = _random_params(rng, shape, num_bins)
    x = rng.normal(size=shape).astype(np.float32) * 3.0

    y, logdet = spline.piecewise_rational_quadratic_transform(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(h), jnp.asarray(d),
        inverse=False, tails="linear", tail_bound=5.0)
    x2, neg_logdet = spline.piecewise_rational_quadratic_transform(
        y, jnp.asarray(w), jnp.asarray(h), jnp.asarray(d),
        inverse=True, tails="linear", tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(x2), x, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logdet), -np.asarray(neg_logdet),
                               atol=1e-3)

    # log|det| vs autodiff derivative (elementwise transform => grad of sum)
    import jax

    def fwd_sum(xx):
        yy, _ = spline.piecewise_rational_quadratic_transform(
            xx, jnp.asarray(w), jnp.asarray(h), jnp.asarray(d),
            inverse=False, tails="linear", tail_bound=5.0)
        return yy.sum()

    dydx = jax.grad(fwd_sum)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logdet),
                               np.log(np.abs(np.asarray(dydx))), atol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_reference(inverse):
    add_reference_to_path()
    import torch
    import transforms as ref_transforms

    rng = np.random.default_rng(3)
    shape = (2, 4, 9)
    num_bins = 10
    w, h, d = _random_params(rng, shape, num_bins)
    x = rng.normal(size=shape).astype(np.float32) * 3.0

    ours, our_ld = spline.piecewise_rational_quadratic_transform(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(h), jnp.asarray(d),
        inverse=inverse, tails="linear", tail_bound=5.0)

    ref, ref_ld = ref_transforms.piecewise_rational_quadratic_transform(
        torch.tensor(x), torch.tensor(w), torch.tensor(h), torch.tensor(d),
        inverse=inverse, tails="linear", tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(our_ld), ref_ld.numpy(), atol=1e-3)
