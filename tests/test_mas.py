"""MAS scan kernel vs an independent numpy Viterbi oracle.

The oracle re-implements the DP recurrence from the published MAS algorithm
(same edge rules the reference's numba kernel uses, core.py:17-35).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from diff_vits_tpu.core import masking
from diff_vits_tpu.ops.mas import maximum_path


def numpy_maximum_path(neg_cent, t_ys, t_xs):
    """Per-sample serial Viterbi DP oracle (float32, -1e9 sentinel)."""
    b, T_y, T_x = neg_cent.shape
    paths = np.zeros((b, T_y, T_x), np.int32)
    neg = -1e9
    for i in range(b):
        value = neg_cent[i].copy()
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = neg if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else neg
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    b, T_y, T_x = 4, 37, 13
    t_ys = rng.integers(T_x, T_y + 1, size=b)  # mel >= text so a path exists
    t_xs = rng.integers(2, T_x + 1, size=b)
    t_ys = np.maximum(t_ys, t_xs)
    neg_cent = rng.normal(size=(b, T_y, T_x)).astype(np.float32)

    y_mask = masking.sequence_mask(jnp.asarray(t_ys), T_y).astype(jnp.float32)
    x_mask = masking.sequence_mask(jnp.asarray(t_xs), T_x).astype(jnp.float32)
    mask = y_mask[:, :, None] * x_mask[:, None, :]

    ours = np.asarray(maximum_path(jnp.asarray(neg_cent), mask))
    oracle = numpy_maximum_path(neg_cent, t_ys, t_xs)
    np.testing.assert_array_equal(ours, oracle.astype(np.float32))


def test_mas_path_properties():
    rng = np.random.default_rng(42)
    b, T_y, T_x = 2, 50, 10
    t_ys = np.array([50, 33])
    t_xs = np.array([10, 6])
    neg_cent = rng.normal(size=(b, T_y, T_x)).astype(np.float32)
    y_mask = masking.sequence_mask(jnp.asarray(t_ys), T_y).astype(jnp.float32)
    x_mask = masking.sequence_mask(jnp.asarray(t_xs), T_x).astype(jnp.float32)
    mask = y_mask[:, :, None] * x_mask[:, None, :]
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), mask))
    for i in range(b):
        p = path[i, :t_ys[i], :t_xs[i]]
        # every frame assigned exactly one token
        np.testing.assert_array_equal(p.sum(1), np.ones(t_ys[i]))
        # durations sum to mel length, every token gets >= 1 frame
        w = p.sum(0)
        assert w.sum() == t_ys[i]
        assert (w >= 1).all()
        # monotonic non-decreasing token index
        idx = p.argmax(1)
        assert (np.diff(idx) >= 0).all()


def test_mas_pallas_interpret_matches_scan():
    """Pallas kernel (interpret mode on CPU) vs the scan implementation."""
    from diff_vits_tpu.ops.mas_pallas import maximum_path_pallas

    rng = np.random.default_rng(7)
    b, T_y, T_x = 3, 41, 11
    t_ys = np.array([41, 30, 25])
    t_xs = np.array([11, 7, 5])
    neg_cent = rng.normal(size=(b, T_y, T_x)).astype(np.float32)
    y_mask = masking.sequence_mask(jnp.asarray(t_ys), T_y).astype(jnp.float32)
    x_mask = masking.sequence_mask(jnp.asarray(t_xs), T_x).astype(jnp.float32)
    mask = y_mask[:, :, None] * x_mask[:, None, :]

    scan_path = np.asarray(maximum_path(jnp.asarray(neg_cent), mask))
    pallas_path = np.asarray(
        maximum_path_pallas(jnp.asarray(neg_cent), mask, interpret=True))
    np.testing.assert_array_equal(pallas_path, scan_path)


def test_mas_native_matches_oracle():
    """C++ host kernel vs the numpy oracle."""
    from diff_vits_tpu.ops.mas_native import maximum_path_native

    rng = np.random.default_rng(11)
    b, T_y, T_x = 5, 64, 17
    t_xs = rng.integers(2, T_x + 1, size=b)
    t_ys = np.maximum(rng.integers(T_x, T_y + 1, size=b), t_xs)
    neg_cent = rng.normal(size=(b, T_y, T_x)).astype(np.float32)

    native = maximum_path_native(neg_cent, t_ys, t_xs)
    oracle = numpy_maximum_path(neg_cent, t_ys, t_xs)
    np.testing.assert_array_equal(native, oracle)
