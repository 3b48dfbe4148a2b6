"""DPM-Solver / DPM-Solver++ sampler library, compiled as XLA programs.

Parity surface: the reference ``DPM_Solver`` — both algorithm types
('dpmsolver++' data prediction and 'dpmsolver' noise prediction,
sampler/dpm_solver.py:336-399), multistep orders 1-3 (:583-905),
singlestep / singlestep_fixed orders 1-3 (:596-795, :905-955 dispatch,
:482-541 order scheduling), the adaptive step-size solver (:956-1010),
``inverse`` (:1032-1045), the three time grids logSNR / time_uniform /
time_quadratic (:453-480), 'dpmsolver' and 'taylor' high-order flavors,
dynamic thresholding (:400-427), denoise_to_zero (:543-548), and the
model_wrapper noise/x_start/v/score + guidance conversions (:170-334, as
``wrap_model``).

The production configuration (model3.py:1149-1159: 40 steps, order 2,
multistep, time_uniform, dpmsolver++) compiles to an unrolled head +
homogeneous ``lax.scan`` interior + unrolled tail: static shapes, one
program, ~steps model evaluations. Singlestep methods have heterogeneous
per-step order, so they unroll; the adaptive method is a
``lax.while_loop``. The hot path stays the scan.

The model callback is an x0 predictor called with the reference's discrete
time mapping t_discrete = t * N - 1 (dpm_solver.py:251-255 via
model_wrapper's get_model_input_time); for algorithm_type='dpmsolver' it
is converted to a noise predictor internally (the reference's
noise_prediction_fn route).
"""
from __future__ import annotations

import inspect
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diff_vits_tpu.diffusion.noise_schedule import NoiseScheduleVP


def get_time_steps(ns: NoiseScheduleVP, skip_type: str, t_T: float,
                   t_0: float, N: int) -> jnp.ndarray:
    """Sampling grid of N+1 times from t_T to t_0 (dpm_solver.py:453)."""
    if skip_type == "time_uniform":
        return jnp.asarray(np.linspace(t_T, t_0, N + 1), jnp.float32)
    if skip_type == "logSNR":
        lam_T = ns.marginal_lambda(jnp.float32(t_T))
        lam_0 = ns.marginal_lambda(jnp.float32(t_0))
        lams = jnp.linspace(lam_T, lam_0, N + 1)
        return ns.inverse_lambda(lams).astype(jnp.float32)
    if skip_type == "time_quadratic":
        return jnp.asarray(
            np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2, jnp.float32)
    raise ValueError(f"unsupported skip_type {skip_type!r}")


def time_steps_uniform(ns: NoiseScheduleVP, steps: int):
    return get_time_steps(ns, "time_uniform", ns.T, 1.0 / ns.total_N, steps)


def dynamic_thresholding(x0: jnp.ndarray, ratio: float = 0.995,
                         max_val: float = 1.0) -> jnp.ndarray:
    """Imagen-style per-sample percentile clamp of the x0 prediction
    (dpm_solver.py:416-427)."""
    b = x0.shape[0]
    s = jnp.quantile(jnp.abs(x0).reshape(b, -1).astype(jnp.float32),
                     ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((b,) + (1,) * (x0.ndim - 1))
    return (jnp.clip(x0, -s, s) / s).astype(x0.dtype)


def adapt_x0_fn(x0_fn: Callable) -> Callable:
    """Normalize a model callback to ``(x, t_discrete, step_index)``.

    Callbacks taking only ``(x, t_discrete)`` are wrapped; 3-arg callbacks
    additionally receive the solver's grid index, letting them index
    precomputed per-step conditioning (loop hoisting)."""
    try:
        n = len(inspect.signature(x0_fn).parameters)
    except (TypeError, ValueError):
        n = 2
    if n >= 3:
        return x0_fn
    return lambda x, td, i: x0_fn(x, td)


def wrap_model(model: Callable, noise_schedule: NoiseScheduleVP,
               model_type: str = "x_start", guidance_type: str = "uncond",
               condition=None, unconditional_condition=None,
               guidance_scale: float = 1.0,
               classifier_fn: Optional[Callable] = None) -> Callable:
    """Convert a noise/x_start/v/score model (+ optional guidance) into the
    x0-prediction callback our solvers consume.

    Parity: sampler/dpm_solver.py:170-334 (model_wrapper) composed with
    data_prediction_fn (:434-443). The wrapped model is called as
    ``model(x, t_discrete, [cond])``; guidance is applied in noise space
    exactly as the reference does, then converted to x0.
    """
    ns = noise_schedule

    def expand(a, nd):
        return a.reshape((-1,) + (1,) * (nd - 1))

    def to_noise(out, x, t_cont):
        nd = x.ndim
        if model_type == "noise":
            return out
        alpha = expand(ns.marginal_alpha(t_cont), nd)
        sigma = expand(ns.marginal_std(t_cont), nd)
        if model_type == "x_start":
            return (x - alpha * out) / sigma
        if model_type == "v":
            return alpha * out + sigma * x
        if model_type == "score":
            return -sigma * out
        raise ValueError(f"unsupported model_type {model_type!r}")

    def noise_to_x0(noise, x, t_cont):
        nd = x.ndim
        alpha = expand(ns.marginal_alpha(t_cont), nd)
        sigma = expand(ns.marginal_std(t_cont), nd)
        return (x - sigma * noise) / alpha

    def x0_fn(x, t_discrete):
        t_cont = (t_discrete + 1.0) / ns.total_N
        if guidance_type == "uncond":
            out = model(x, t_discrete)
            if model_type == "x_start":
                return out
            return noise_to_x0(to_noise(out, x, t_cont), x, t_cont)
        if guidance_type == "classifier":
            if classifier_fn is None:
                raise ValueError("classifier guidance requires classifier_fn")
            grad = jax.grad(
                lambda xx: classifier_fn(xx, t_discrete, condition).sum())(x)
            noise = to_noise(model(x, t_discrete), x, t_cont)
            sigma = expand(ns.marginal_std(t_cont), x.ndim)
            return noise_to_x0(noise - guidance_scale * sigma * grad,
                               x, t_cont)
        if guidance_type == "classifier-free":
            if guidance_scale == 1.0 or unconditional_condition is None:
                noise = to_noise(model(x, t_discrete, condition), x, t_cont)
                return noise_to_x0(noise, x, t_cont)
            n_c = to_noise(model(x, t_discrete, condition), x, t_cont)
            n_u = to_noise(model(x, t_discrete, unconditional_condition),
                           x, t_cont)
            guided = n_u + guidance_scale * (n_c - n_u)
            return noise_to_x0(guided, x, t_cont)
        raise ValueError(f"unsupported guidance_type {guidance_type!r}")

    return x0_fn


def _singlestep_orders(steps: int, order: int):
    """DPM-Solver-fast order schedule (dpm_solver.py:515-534)."""
    if order == 3:
        k = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (k - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (k - 1) + [1]
        return [3] * (k - 1) + [2]
    if order == 2:
        if steps % 2 == 0:
            return [2] * (steps // 2)
        return [2] * (steps // 2) + [1]
    if order == 1:
        return [1] * steps
    raise ValueError("order must be 1, 2 or 3")


def sample_dpmpp(
    x0_fn: Callable,
    noise_schedule: NoiseScheduleVP,
    x: jnp.ndarray,
    steps: int = 20,
    order: int = 2,
    lower_order_final: bool = True,
    skip_type: str = "time_uniform",
    method: str = "multistep",
    solver_type: str = "dpmsolver",
    algorithm_type: str = "dpmsolver++",
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    correcting_x0_fn: Optional[object] = None,
    thresholding_ratio: float = 0.995,
    thresholding_max_val: float = 1.0,
    denoise_to_zero: bool = False,
    atol: float = 0.0078,
    rtol: float = 0.05,
    h_init: float = 0.05,
    theta: float = 0.9,
    t_err: float = 1e-5,
) -> jnp.ndarray:
    """DPM-Solver / DPM-Solver++ from x at t_start (default T).

    Args:
      x0_fn: ``(x, t_discrete[B]) -> x0`` prediction (the diffusion model).
      steps: number of model evaluations (ignored by method='adaptive').
      order: 1, 2 or 3 (adaptive: 2 or 3).
      skip_type: 'time_uniform' | 'logSNR' | 'time_quadratic'.
      method: 'multistep' | 'singlestep' | 'singlestep_fixed' | 'adaptive'.
      solver_type: 'dpmsolver' | 'taylor' — the order>=2 update flavor.
      algorithm_type: 'dpmsolver++' (data prediction) | 'dpmsolver'
        (noise prediction; the x0 callback is converted internally).
      t_start/t_end: solve interval (defaults T -> 1/N; swap for inversion).
      correcting_x0_fn: None, 'dynamic_thresholding', or a callable
        ``x0 -> x0`` applied to every x0 prediction (dpmsolver++ only,
        like the reference).
      denoise_to_zero: one extra x0 evaluation at t_end after the last
        step (dpm_solver.py:543-548,1243-1249).
      atol/rtol/h_init/theta/t_err: adaptive-solver controls (:956).
    """
    ns = noise_schedule
    t_0 = 1.0 / ns.total_N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    b = x.shape[0]
    base_fn = adapt_x0_fn(x0_fn)
    if solver_type not in ("dpmsolver", "taylor"):
        raise ValueError("solver_type must be 'dpmsolver' or 'taylor'")
    if algorithm_type not in ("dpmsolver++", "dpmsolver"):
        raise ValueError(
            "algorithm_type must be 'dpmsolver++' or 'dpmsolver'")
    pp = algorithm_type == "dpmsolver++"

    if correcting_x0_fn == "dynamic_thresholding":
        def correct(x0):
            return dynamic_thresholding(x0, thresholding_ratio,
                                        thresholding_max_val)
    elif correcting_x0_fn is None:
        correct = None
    else:
        correct = correcting_x0_fn

    def x0_pred(xv, td, i):
        out = base_fn(xv, td, i)
        return correct(out) if correct is not None else out

    if pp:
        fn = x0_pred
    else:
        # noise_prediction_fn route (:429-432): no x0 correction
        def fn(xv, td, i):
            x0 = base_fn(xv, td, i)
            t_cont = (td + 1.0) / ns.total_N
            shape = (-1,) + (1,) * (xv.ndim - 1)
            alpha = ns.marginal_alpha(t_cont).reshape(shape)
            sigma = ns.marginal_std(t_cont).reshape(shape)
            return (xv - alpha * x0) / sigma

    def eval_at(xv, t_cont, i):
        td = jnp.full((b,), t_cont * ns.total_N - 1.0, jnp.float32)
        return x0_pred(xv, td, i)

    if method == "multistep":
        x = _sample_multistep(fn, ns, x, steps, order, lower_order_final,
                              skip_type, solver_type, pp, t_T, t_0)
        last_i = steps
    elif method in ("singlestep", "singlestep_fixed"):
        if method == "singlestep_fixed":
            orders = [order] * (steps // order)
            ts_outer = get_time_steps(ns, skip_type, t_T, t_0, len(orders))
        else:
            orders = _singlestep_orders(steps, order)
            if skip_type == "logSNR":
                ts_outer = get_time_steps(ns, skip_type, t_T, t_0,
                                          len(orders))
            else:
                full = get_time_steps(ns, skip_type, t_T, t_0, steps)
                ts_outer = full[np.cumsum([0] + orders)]
        x = _sample_singlestep(fn, ns, x, ts_outer, orders, solver_type,
                               skip_type, pp)
        last_i = len(orders)
    elif method == "adaptive":
        x = _sample_adaptive(fn, ns, x, order, t_T, t_0, h_init, atol,
                             rtol, theta, t_err, solver_type, pp)
        last_i = 0
    else:
        raise ValueError(f"unsupported method {method!r}")

    if denoise_to_zero:
        x = eval_at(x, jnp.float32(t_0), last_i)
    return x


def inverse_dpmpp(x0_fn, noise_schedule, x, steps: int = 20, **kwargs):
    """Invert a sample from t=1/N towards t=T (dpm_solver.py:1032-1045):
    ``sample`` with the solve interval reversed."""
    ns = noise_schedule
    t_0 = kwargs.pop("t_start", 1.0 / ns.total_N)
    t_T = kwargs.pop("t_end", ns.T)
    return sample_dpmpp(x0_fn, noise_schedule, x, steps=steps,
                        t_start=t_0, t_end=t_T, **kwargs)


def _sample_multistep(fn, ns, x, steps, order, lower_order_final, skip_type,
                      solver_type, pp, t_T, t_0):
    ts = get_time_steps(ns, skip_type, t_T, t_0, steps)
    lam = ns.marginal_lambda(ts)
    sig = ns.marginal_std(ts)
    alp = jnp.exp(ns.marginal_log_mean_coeff(ts))
    b = x.shape[0]

    def eval_model(x, i):
        td = jnp.full((b,), ts[i] * ns.total_N - 1.0, jnp.float32)
        return fn(x, td, i)

    def update1(x, m0, i):
        """First-order arrival at ts[i+1] (dpm_solver.py:562-600)."""
        h = lam[i + 1] - lam[i]
        if pp:
            return (sig[i + 1] / sig[i] * x
                    - alp[i + 1] * jnp.expm1(-h) * m0)
        return alp[i + 1] / alp[i] * x - sig[i + 1] * jnp.expm1(h) * m0

    def update2(x, m0, m1, i):
        """Second-order multistep arrival at ts[i+1] using models at ts[i]
        (m0) and ts[i-1] (m1). Parity: dpm_solver.py:796-852."""
        h = lam[i + 1] - lam[i]
        r0 = (lam[i] - lam[i - 1]) / h
        D1_0 = (m0 - m1) / r0
        if pp:
            phi_1 = jnp.expm1(-h)
            base = sig[i + 1] / sig[i] * x - alp[i + 1] * phi_1 * m0
            if solver_type == "dpmsolver":
                return base - 0.5 * alp[i + 1] * phi_1 * D1_0
            return base + alp[i + 1] * (phi_1 / h + 1.0) * D1_0
        phi_1 = jnp.expm1(h)
        base = alp[i + 1] / alp[i] * x - sig[i + 1] * phi_1 * m0
        if solver_type == "dpmsolver":
            return base - 0.5 * sig[i + 1] * phi_1 * D1_0
        return base - sig[i + 1] * (phi_1 / h - 1.0) * D1_0

    def update3(x, m0, m1, m2, i):
        """Third-order multistep arrival at ts[i+1] using models at ts[i],
        ts[i-1], ts[i-2]. Parity: dpm_solver.py:854-905."""
        h = lam[i + 1] - lam[i]
        h_0 = lam[i] - lam[i - 1]
        h_1 = lam[i - 1] - lam[i - 2]
        r0, r1 = h_0 / h, h_1 / h
        D1_0 = (m0 - m1) / r0
        D1_1 = (m1 - m2) / r1
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / (r0 + r1)
        if pp:
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            return (sig[i + 1] / sig[i] * x
                    - alp[i + 1] * phi_1 * m0
                    + alp[i + 1] * phi_2 * D1
                    - alp[i + 1] * phi_3 * D2)
        phi_1 = jnp.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        return (alp[i + 1] / alp[i] * x
                - sig[i + 1] * phi_1 * m0
                - sig[i + 1] * phi_2 * D1
                - sig[i + 1] * phi_3 * D2)

    assert steps >= order >= 1
    m1 = eval_model(x, 0)

    if order == 1:
        x = update1(x, m1, 0)
        if steps > 1:
            def body(carry, i):
                x = carry
                m = eval_model(x, i)
                x = update1(x, m, i)
                return x, None
            x, _ = jax.lax.scan(body, x,
                                jnp.arange(1, steps, dtype=jnp.int32))
        return x

    if order == 2:
        x = update1(x, m1, 0)
        m0 = eval_model(x, 1)
        final_order = 1 if (lower_order_final and steps < 10) else 2

        if steps == 2:
            if final_order == 1:
                return update1(x, m0, 1)
            return update2(x, m0, m1, 1)

        # interior arrivals ts[2..steps-1], all order 2
        def body(carry, i):
            x, m0, m1 = carry
            x = update2(x, m0, m1, i - 1)
            m_new = eval_model(x, i)
            return (x, m_new, m0), None

        (x, m0, m1), _ = jax.lax.scan(
            body, (x, m0, m1), jnp.arange(2, steps, dtype=jnp.int32))

        if final_order == 1:
            return update1(x, m0, steps - 1)
        return update2(x, m0, m1, steps - 1)

    if order != 3:
        raise ValueError("order must be 1, 2 or 3")

    # order 3: warmup order 1 then 2 (driver :1186-1192), order-3 interior,
    # tail per lower_order_final (step_order = min(3, steps+1-step), :1199)
    x = update1(x, m1, 0)
    m0 = eval_model(x, 1)
    x = update2(x, m0, m1, 1)
    m_new = eval_model(x, 2)
    m2, m1, m0 = m1, m0, m_new
    lower = lower_order_final and steps < 10
    # arrivals at ts[3..steps]; the final arrival happens outside the scan
    # (no model eval after it), and the last two drop order when `lower`
    n_full = (steps - 3) if not lower else max(steps - 4, 0)

    def body(carry, i):
        x, m0, m1, m2 = carry
        x = update3(x, m0, m1, m2, i - 1)
        m_new = eval_model(x, i)
        return (x, m_new, m0, m1), None

    if n_full > 0:
        (x, m0, m1, m2), _ = jax.lax.scan(
            body, (x, m0, m1, m2),
            jnp.arange(3, 3 + n_full, dtype=jnp.int32))
    if not lower:
        return update3(x, m0, m1, m2, steps - 1)
    # remaining arrivals with decreasing order; evaluate between them
    i = 3 + n_full  # first un-arrived grid point
    remaining = steps + 1 - i  # 1 or 2 arrivals left
    if remaining == 2:
        x = update2(x, m0, m1, i - 1)
        m_new = eval_model(x, i)
        m2, m1, m0 = m1, m0, m_new
        i += 1
    return update1(x, m0, i - 1)


# ---------------------------------------------------------------------------
# Traced singlestep updates shared by the singlestep driver and the
# adaptive solver. s/t may be python floats or traced scalars.
# ---------------------------------------------------------------------------

def _coeffs(ns, t):
    lam = ns.marginal_lambda(t)
    log_alp = ns.marginal_log_mean_coeff(t)
    sig = ns.marginal_std(t)
    return lam, jnp.exp(log_alp), sig, log_alp


def _single_update1(ns, x, s, t, m_s, pp):
    """DPM-Solver-1 / DDIM step (dpm_solver.py:562-581)."""
    lam_s, alp_s, sig_s, loga_s = _coeffs(ns, s)
    lam_t, alp_t, sig_t, loga_t = _coeffs(ns, t)
    h = lam_t - lam_s
    if pp:
        return sig_t / sig_s * x - alp_t * jnp.expm1(-h) * m_s
    return jnp.exp(loga_t - loga_s) * x - sig_t * jnp.expm1(h) * m_s


def _single_update2(eval_fn, ns, x, s, t, r1, m_s, solver_type, pp):
    """Singlestep second-order update; returns (x_t, m_s1)
    (dpm_solver.py:596-674)."""
    lam_s, alp_s, sig_s, loga_s = _coeffs(ns, s)
    lam_t, alp_t, sig_t, loga_t = _coeffs(ns, t)
    h = lam_t - lam_s
    lam_s1 = lam_s + r1 * h
    s1 = ns.inverse_lambda(lam_s1)
    _, alp_s1, sig_s1, loga_s1 = _coeffs(ns, s1)
    if pp:
        phi_11 = jnp.expm1(-r1 * h)
        phi_1 = jnp.expm1(-h)
        x_s1 = sig_s1 / sig_s * x - alp_s1 * phi_11 * m_s
        m_s1 = eval_fn(x_s1, s1)
        base = sig_t / sig_s * x - alp_t * phi_1 * m_s
        if solver_type == "dpmsolver":
            x_t = base - (0.5 / r1) * alp_t * phi_1 * (m_s1 - m_s)
        else:
            x_t = base + (1.0 / r1) * alp_t * (phi_1 / h + 1.0) * (
                m_s1 - m_s)
        return x_t, m_s1
    phi_11 = jnp.expm1(r1 * h)
    phi_1 = jnp.expm1(h)
    x_s1 = jnp.exp(loga_s1 - loga_s) * x - sig_s1 * phi_11 * m_s
    m_s1 = eval_fn(x_s1, s1)
    base = jnp.exp(loga_t - loga_s) * x - sig_t * phi_1 * m_s
    if solver_type == "dpmsolver":
        x_t = base - (0.5 / r1) * sig_t * phi_1 * (m_s1 - m_s)
    else:
        x_t = base - (1.0 / r1) * sig_t * (phi_1 / h - 1.0) * (m_s1 - m_s)
    return x_t, m_s1


def _single_update3(eval_fn, ns, x, s, t, r1, r2, m_s, m_s1, solver_type,
                    pp):
    """Singlestep third-order update; ``m_s1`` may be None (evaluated at
    s1 = inv(lam_s + r1 h)). Returns (x_t, m_s1, m_s2)
    (dpm_solver.py:675-795)."""
    lam_s, alp_s, sig_s, loga_s = _coeffs(ns, s)
    lam_t, alp_t, sig_t, loga_t = _coeffs(ns, t)
    h = lam_t - lam_s
    lam_s1, lam_s2 = lam_s + r1 * h, lam_s + r2 * h
    s1, s2 = ns.inverse_lambda(lam_s1), ns.inverse_lambda(lam_s2)
    _, alp_s1, sig_s1, loga_s1 = _coeffs(ns, s1)
    _, alp_s2, sig_s2, loga_s2 = _coeffs(ns, s2)
    if pp:
        phi_11 = jnp.expm1(-r1 * h)
        phi_12 = jnp.expm1(-r2 * h)
        phi_1 = jnp.expm1(-h)
        phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        if m_s1 is None:
            x_s1 = sig_s1 / sig_s * x - alp_s1 * phi_11 * m_s
            m_s1 = eval_fn(x_s1, s1)
        x_s2 = (sig_s2 / sig_s * x - alp_s2 * phi_12 * m_s
                + (r2 / r1) * alp_s2 * phi_22 * (m_s1 - m_s))
        m_s2 = eval_fn(x_s2, s2)
        base = sig_t / sig_s * x - alp_t * phi_1 * m_s
        if solver_type == "dpmsolver":
            x_t = base + (1.0 / r2) * alp_t * phi_2 * (m_s2 - m_s)
        else:
            D1_0 = (m_s1 - m_s) / r1
            D1_1 = (m_s2 - m_s) / r2
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            x_t = base + alp_t * phi_2 * D1 - alp_t * phi_3 * D2
        return x_t, m_s1, m_s2
    phi_11 = jnp.expm1(r1 * h)
    phi_12 = jnp.expm1(r2 * h)
    phi_1 = jnp.expm1(h)
    phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
    phi_2 = phi_1 / h - 1.0
    phi_3 = phi_2 / h - 0.5
    if m_s1 is None:
        x_s1 = jnp.exp(loga_s1 - loga_s) * x - sig_s1 * phi_11 * m_s
        m_s1 = eval_fn(x_s1, s1)
    x_s2 = (jnp.exp(loga_s2 - loga_s) * x - sig_s2 * phi_12 * m_s
            - (r2 / r1) * sig_s2 * phi_22 * (m_s1 - m_s))
    m_s2 = eval_fn(x_s2, s2)
    base = jnp.exp(loga_t - loga_s) * x - sig_t * phi_1 * m_s
    if solver_type == "dpmsolver":
        x_t = base - (1.0 / r2) * sig_t * phi_2 * (m_s2 - m_s)
    else:
        D1_0 = (m_s1 - m_s) / r1
        D1_1 = (m_s2 - m_s) / r2
        D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
        D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
        x_t = base - sig_t * phi_2 * D1 - sig_t * phi_3 * D2
    return x_t, m_s1, m_s2


def _sample_singlestep(fn, ns, x, ts_outer, orders, solver_type, skip_type,
                       pp):
    """Singlestep driver (dpm_solver.py:1216-1235). Per-step orders are
    static, so the outer loop unrolls."""
    ts_outer = np.asarray(ts_outer, np.float32)
    b = x.shape[0]

    def make_eval(i):
        def eval_fn(xv, t_cont):
            td = (jnp.asarray(t_cont, jnp.float32) * ns.total_N
                  - 1.0) * jnp.ones((b,), jnp.float32)
            return fn(xv, td, i)
        return eval_fn

    for step, order in enumerate(orders):
        s, t = float(ts_outer[step]), float(ts_outer[step + 1])
        eval_fn = make_eval(step)
        m_s = eval_fn(x, s)
        if order == 1:
            x = _single_update1(ns, x, s, t, m_s, pp)
            continue
        # r1/r2 from the inner grid of the chosen skip_type (:1228-1232)
        inner = np.asarray(get_time_steps(ns, skip_type, s, t, order))
        lam_in = np.asarray(ns.marginal_lambda(jnp.asarray(inner)))
        h_full = lam_in[-1] - lam_in[0]
        r1 = float((lam_in[1] - lam_in[0]) / h_full)
        if order == 2:
            x, _ = _single_update2(eval_fn, ns, x, s, t, r1, m_s,
                                   solver_type, pp)
            continue
        r2 = float((lam_in[2] - lam_in[0]) / h_full)
        x, _, _ = _single_update3(eval_fn, ns, x, s, t, r1, r2, m_s, None,
                                  solver_type, pp)
    return x


def _sample_adaptive(fn, ns, x, order, t_T, t_0, h_init, atol, rtol, theta,
                     t_err, solver_type, pp):
    """Adaptive step-size solver (dpm_solver.py:956-1010): embedded
    lower/higher singlestep pair, step accepted when the scaled error
    E <= 1, logSNR step h <- min(theta h E^(-1/order), lambda_0 - lambda_s).
    Compiled as a ``lax.while_loop``."""
    if order not in (2, 3):
        raise ValueError("adaptive solver supports order 2 or 3")
    b = x.shape[0]

    def eval_fn(xv, t_cont):
        td = (t_cont * ns.total_N - 1.0) * jnp.ones((b,), jnp.float32)
        return fn(xv, td, 0)

    lam_0 = ns.marginal_lambda(jnp.float32(t_0))

    def cond(carry):
        x, x_prev, s, h = carry
        return jnp.abs(s - t_0) > t_err

    def body(carry):
        x, x_prev, s, h = carry
        lam_s = ns.marginal_lambda(s)
        t = ns.inverse_lambda(lam_s + h)
        m_s = eval_fn(x, s)
        if order == 2:
            x_lower = _single_update1(ns, x, s, t, m_s, pp)
            x_higher, _ = _single_update2(eval_fn, ns, x, s, t, 0.5, m_s,
                                          solver_type, pp)
        else:
            x_lower, m_s1 = _single_update2(eval_fn, ns, x, s, t, 1.0 / 3.0,
                                            m_s, solver_type, pp)
            x_higher, _, _ = _single_update3(
                eval_fn, ns, x, s, t, 1.0 / 3.0, 2.0 / 3.0, m_s, m_s1,
                solver_type, pp)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                     jnp.abs(x_prev)))
        err = ((x_higher - x_lower) / delta).reshape(b, -1)
        E = jnp.sqrt(jnp.mean(err * err, axis=-1)).max()
        accept = E <= 1.0
        x_new = jnp.where(accept, x_higher, x)
        x_prev_new = jnp.where(accept, x_lower, x_prev)
        s_new = jnp.where(accept, t, s)
        lam_new = ns.marginal_lambda(s_new)
        h_new = jnp.minimum(theta * h * E ** (-1.0 / order),
                            lam_0 - lam_new)
        return (x_new, x_prev_new, s_new, h_new)

    carry = (x, x, jnp.float32(t_T), jnp.float32(h_init))
    x, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return x
