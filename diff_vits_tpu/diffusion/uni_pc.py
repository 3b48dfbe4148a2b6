"""UniPC (unified predictor-corrector) sampler, compiled as one XLA program.

Parity: ``UniPC`` variant='bh2', data-prediction, multistep, order 2,
time_uniform — the reference's default inference path (model3.py:1183-1192:
30 steps; sampler/uni_pc.py:471-588 bh update, :590-672 driver with
lower_order_final and corrector disabled on the last step).

Like the reference, the model value stored for the next step is the one
evaluated at the *predictor* x_t (uni_pc.py:648-658); the corrector only
revises x. One model evaluation per step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diff_vits_tpu.diffusion.dpm_solver import adapt_x0_fn, time_steps_uniform
from diff_vits_tpu.diffusion.noise_schedule import NoiseScheduleVP


def sample_unipc(
    x0_fn: Callable,
    noise_schedule: NoiseScheduleVP,
    x: jnp.ndarray,
    steps: int = 30,
    order: int = 2,
    variant: str = "bh2",
) -> jnp.ndarray:
    """UniPC multistep sampling (data prediction) from x ~ N(0, I).

    Args:
      x0_fn: ``(x, t_discrete[B]) -> x0`` prediction.
    """
    assert order in (1, 2), "UniPC orders 1/2 supported (reference uses 2)"
    ns = noise_schedule
    ts = time_steps_uniform(ns, steps)
    lam = ns.marginal_lambda(ts)
    sig = ns.marginal_std(ts)
    alp = jnp.exp(ns.marginal_log_mean_coeff(ts))
    b = x.shape[0]

    fn = adapt_x0_fn(x0_fn)

    def eval_model(x, i):
        td = jnp.full((b,), ts[i] * ns.total_N - 1.0, jnp.float32)
        return fn(x, td, i)

    def bh_coeffs(h, rk):
        """R, b for order 2 (uni_pc.py:509-545). hh = -h (predict_x0)."""
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        B_h = hh if variant == "bh1" else jnp.expm1(hh)
        # i = 1: b1 = (h_phi_1/hh - 1) * 1 / B_h
        h_phi_k1 = h_phi_1 / hh - 1.0
        b1 = h_phi_k1 / B_h
        # i = 2: factorial_i = 2, h_phi_k = h_phi_k1/hh - 1/2
        h_phi_k2 = h_phi_k1 / hh - 0.5
        b2 = h_phi_k2 * 2.0 / B_h
        return h_phi_1, B_h, b1, b2

    def step_order1(x, m0, i, use_corrector):
        """Arrival at ts[i+1], order 1 (no D1s). uni_pc.py:471-585."""
        h = lam[i + 1] - lam[i]
        h_phi_1, B_h, b1, b2 = bh_coeffs(h, None)
        x_t_ = sig[i + 1] / sig[i] * x - alp[i + 1] * h_phi_1 * m0
        x_t = x_t_
        model_t = None
        if use_corrector:
            model_t = eval_model(x_t, i + 1)
            # order 1 corrector uses rhos_c = [0.5] (uni_pc.py:546-549)
            D1_t = model_t - m0
            x_t = x_t_ - alp[i + 1] * B_h * (0.5 * D1_t)
        return x_t, model_t

    def step_order2(x, m0, m1, i, use_corrector):
        """Arrival at ts[i+1], order 2 using models at ts[i], ts[i-1]."""
        h = lam[i + 1] - lam[i]
        rk = (lam[i - 1] - lam[i]) / h
        D1s = (m1 - m0) / rk  # [B, ...]
        h_phi_1, B_h, b1, b2 = bh_coeffs(h, rk)
        x_t_ = sig[i + 1] / sig[i] * x - alp[i + 1] * h_phi_1 * m0
        # predictor: rhos_p = [0.5] (uni_pc.py:539-543 simplified order 2)
        x_t = x_t_ - alp[i + 1] * B_h * (0.5 * D1s)
        model_t = None
        if use_corrector:
            # rhos_c = solve([[1, 1], [rk, 1]], [b1, b2])
            #   rk*r1 + r2 = b2 ; r1 + r2 = b1  =>  r1 = (b2-b1)/(rk-1)
            r1 = (b2 - b1) / (rk - 1.0)
            r2 = b1 - r1
            model_t = eval_model(x_t, i + 1)
            D1_t = model_t - m0
            x_t = x_t_ - alp[i + 1] * B_h * (r1 * D1s + r2 * D1_t)
        return x_t, model_t

    # step 0: model at initial x
    m1 = eval_model(x, 0)

    if order == 1 or steps == 1:
        m0 = m1
        for i in range(steps):
            use_c = i < steps - 1
            x, model_t = step_order1(x, m0, i, use_c)
            if use_c:
                m0 = model_t
        return x

    # init: arrival at ts[1] with order 1 + corrector (uni_pc.py:621-632)
    x, m0 = step_order1(x, m1, 0, True)

    if steps == 2:
        x, _ = step_order2(x, m0, m1, 1, False)
        return x

    # interior arrivals ts[2..steps-1]: order 2 + corrector, one model eval
    def body(carry, i):
        x, m0, m1 = carry
        x, model_t = step_order2(x, m0, m1, i - 1, True)
        return (x, model_t, m0), None

    (x, m0, m1), _ = jax.lax.scan(
        body, (x, m0, m1), jnp.arange(2, steps, dtype=jnp.int32))

    # final arrival at ts[steps]: lower_order_final => order 1, no corrector
    x, _ = step_order1(x, m0, steps - 1, False)
    return x
