"""Parity: Pallas RQ-spline kernel vs the XLA formulation (ops/spline.py),
plus forward/inverse round-trip. Interpret mode on CPU."""
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.ops.spline import unconstrained_rational_quadratic_spline
from diff_vits_tpu.ops.spline_pallas import unconstrained_rqs_pallas


def _params(shape=(4, 96), num_bins=10, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape) * spread, jnp.float32)
    uw = jnp.asarray(rng.normal(size=shape + (num_bins,)), jnp.float32)
    uh = jnp.asarray(rng.normal(size=shape + (num_bins,)), jnp.float32)
    ud = jnp.asarray(rng.normal(size=shape + (num_bins - 1,)), jnp.float32)
    return x, uw, uh, ud


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("tail_bound", [1.0, 5.0])
def test_matches_xla(inverse, tail_bound):
    x, uw, uh, ud = _params()
    ref_out, ref_ld = unconstrained_rational_quadratic_spline(
        x, uw, uh, ud, inverse=inverse, tail_bound=tail_bound)
    out, ld = unconstrained_rqs_pallas(
        x, uw, uh, ud, inverse=inverse, tail_bound=tail_bound)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ref_ld),
                               atol=1e-4, rtol=1e-4)


def test_round_trip():
    x, uw, uh, ud = _params(spread=0.8, seed=3)
    y, ld = unconstrained_rqs_pallas(x, uw, uh, ud, inverse=False)
    x2, ld_inv = unconstrained_rqs_pallas(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # logdet cancellation is float32-limited near bin edges
    np.testing.assert_allclose(np.asarray(ld + ld_inv),
                               np.zeros_like(np.asarray(ld)), atol=1e-3)


def test_1d_input():
    x, uw, uh, ud = _params(shape=(64,), seed=5)
    ref_out, _ = unconstrained_rational_quadratic_spline(x, uw, uh, ud)
    out, _ = unconstrained_rqs_pallas(x, uw, uh, ud)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
