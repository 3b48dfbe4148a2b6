"""DDPM beta schedule, q_sample and ancestral/DDIM sampling loops.

Parity: model3.py:935-1112 (linear beta in float64 downcast to fp32 buffers,
x0-prediction objective, SNR loss weights, p_sample ancestral loop, DDIM).
Sampling loops compile to single XLA programs via ``lax.fori_loop``/``scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear beta schedule in float64. Parity: model3.py:935-942."""
    scale = 1000 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed DDPM buffers (fp32, computed in f64 like the reference's
    register_buffer chain model3.py:976-1017)."""
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray
    num_timesteps: int

    @staticmethod
    def create(timesteps: int = 1000, min_snr_loss_weight: bool = False,
               min_snr_gamma: float = 5.0) -> "GaussianDiffusion":
        betas = linear_beta_schedule(timesteps)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        posterior_variance = (betas * (1.0 - alphas_cumprod_prev)
                              / (1.0 - alphas_cumprod))
        snr = alphas_cumprod / (1 - alphas_cumprod)
        loss_weight = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return GaussianDiffusion(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1 - alphas_cumprod)),
            posterior_mean_coef2=f32(
                (1 - alphas_cumprod_prev) * np.sqrt(alphas)
                / (1 - alphas_cumprod)),
            loss_weight=f32(loss_weight),
            num_timesteps=timesteps,
        )

    # -- helpers ------------------------------------------------------------

    def _extract(self, a, t, ndim):
        out = a[t]
        return out.reshape(out.shape + (1,) * (ndim - 1))

    def q_sample(self, x_start, t, noise):
        """Forward noising. Parity: model3.py:1205-1211."""
        nd = x_start.ndim
        return (self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd)
                * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return ((self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                 - x0)
                / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd))

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (self._extract(self.posterior_mean_coef1, t, nd) * x_start
                + self._extract(self.posterior_mean_coef2, t, nd) * x_t)
        var = self._extract(self.posterior_variance, t, nd)
        log_var = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    # -- samplers -----------------------------------------------------------

    def p_sample_loop(self, model_fn: Callable, shape, key,
                      dtype=jnp.float32, init_noise=None):
        """Ancestral DDPM sampling (model3.py:1049-1075), one fori_loop.

        ``model_fn(x, t[B]) -> x0`` prediction. ``init_noise`` injects x_T.
        """
        key, sub = jax.random.split(key)
        img = (init_noise.astype(dtype) if init_noise is not None
               else jax.random.normal(sub, shape, dtype))

        def body(i, carry):
            img, key = carry
            t = self.num_timesteps - 1 - i
            bt = jnp.full((shape[0],), t, jnp.int32)
            x_start = model_fn(img, bt)
            mean, _, log_var = self.q_posterior(x_start, img, bt)
            key, sub = jax.random.split(key)
            noise = jnp.where(t > 0,
                              jax.random.normal(sub, shape, dtype),
                              jnp.zeros(shape, dtype))
            img = mean + jnp.exp(0.5 * log_var) * noise
            return img, key

        img, _ = jax.lax.fori_loop(0, self.num_timesteps, body, (img, key))
        return img

    def ddim_sample(self, model_fn: Callable, shape, key, steps: int,
                    eta: float = 0.0, dtype=jnp.float32, init_noise=None):
        """DDIM sampling (model3.py:1077-1112) as a scan over time pairs.

        ``init_noise`` injects x_T."""
        times = np.linspace(-1, self.num_timesteps - 1, steps + 1).astype(int)
        times = list(reversed(times.tolist()))
        pairs = np.array(list(zip(times[:-1], times[1:])), np.int32)

        key, sub = jax.random.split(key)
        img = (init_noise.astype(dtype) if init_noise is not None
               else jax.random.normal(sub, shape, dtype))

        def step(carry, pair):
            img, key = carry
            time, time_next = pair[0], pair[1]
            bt = jnp.full((shape[0],), time, jnp.int32)
            x_start = model_fn(img, bt)
            pred_noise = self.predict_noise_from_start(img, bt, x_start)
            alpha = self.alphas_cumprod[time]
            alpha_next = jnp.where(time_next < 0, 1.0,
                                   self.alphas_cumprod[jnp.maximum(time_next, 0)])
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next)
                                   * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma ** 2, 0.0))
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape, dtype)
            img_next = (x_start * jnp.sqrt(alpha_next) + c * pred_noise
                        + sigma * noise)
            img = jnp.where(time_next < 0, x_start, img_next)
            return (img, key), None

        (img, _), _ = jax.lax.scan(step, (img, key), pairs)
        return img
