"""VP noise schedule with discrete log-alpha interpolation tables.

Parity: ``NoiseScheduleVP`` (sampler/uni_pc.py:6-152 == dpm_solver.py:6-167):
discrete-time DPMs are mapped to continuous t via t_i = (i+1)/N; log(alpha_t)
is piecewise-linear interpolated (with linear extrapolation at the ends,
matching ``interpolate_fn`` uni_pc.py:681).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _piecewise_linear(x, xp, yp):
    """y = f(x) piecewise linear over increasing keypoints xp with linear
    extrapolation using the outermost segments (interpolate_fn semantics)."""
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, len(xp) - 2)
    x0, x1 = xp[idx], xp[idx + 1]
    y0, y1 = yp[idx], yp[idx + 1]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


class NoiseScheduleVP:
    """Discrete VP schedule (the only variant the reference uses)."""

    def __init__(self, betas: np.ndarray):
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - np.asarray(betas, np.float64)))
        self.total_N = len(log_alphas)
        self.T = 1.0
        self.t_array = jnp.asarray(
            np.linspace(0, 1, self.total_N + 1)[1:], jnp.float32)
        self.log_alpha_array = jnp.asarray(log_alphas, jnp.float32)

    def marginal_log_mean_coeff(self, t):
        return _piecewise_linear(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))
        return log_mean - log_std

    def inverse_lambda(self, lamb):
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        # log_alpha_array is decreasing; flip for increasing interpolation
        return _piecewise_linear(log_alpha, self.log_alpha_array[::-1],
                                 self.t_array[::-1])
