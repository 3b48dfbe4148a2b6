"""Sampler parity: our compiled UniPC / DPM-Solver++ vs the reference
sampler package, using a deterministic toy x0-model evaluated identically in
torch and jax.
"""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_vits_tpu.diffusion.schedule import GaussianDiffusion  # noqa: E402
from diff_vits_tpu.diffusion.noise_schedule import NoiseScheduleVP  # noqa: E402
from diff_vits_tpu.diffusion.dpm_solver import sample_dpmpp  # noqa: E402
from diff_vits_tpu.diffusion.uni_pc import sample_unipc  # noqa: E402


def _betas():
    return np.asarray(GaussianDiffusion.create(1000).betas)


def _toy_x0_torch(x, t_input, **kwargs):
    t = t_input.reshape(-1, *([1] * (x.dim() - 1))).to(x.dtype)
    return torch.tanh(x * (1 + t / 1000.0)) * 0.5


def _toy_x0_jax(x, t_input):
    t = t_input.reshape(-1, *([1] * (x.ndim - 1))).astype(x.dtype)
    return jnp.tanh(x * (1 + t / 1000.0)) * 0.5


def test_noise_schedule_parity():
    from sampler.uni_pc import NoiseScheduleVP as RefNS
    betas = _betas()
    ref = RefNS(schedule="discrete", betas=torch.tensor(betas))
    ours = NoiseScheduleVP(betas)

    t = np.linspace(1.0 / 1000, 1.0, 57).astype(np.float32)
    for fn in ["marginal_log_mean_coeff", "marginal_alpha", "marginal_std",
               "marginal_lambda"]:
        r = getattr(ref, fn)(torch.tensor(t)).numpy()
        o = np.asarray(getattr(ours, fn)(jnp.asarray(t)))
        np.testing.assert_allclose(o, r, atol=2e-5, err_msg=fn)

    lam = ref.marginal_lambda(torch.tensor(t)).numpy()
    r_inv = ref.inverse_lambda(torch.tensor(lam)).numpy()
    o_inv = np.asarray(ours.inverse_lambda(jnp.asarray(lam)))
    np.testing.assert_allclose(o_inv, r_inv, atol=1e-4)


@pytest.mark.parametrize("steps", [5, 30])
def test_unipc_parity(steps):
    from sampler.uni_pc import NoiseScheduleVP as RefNS, model_wrapper, UniPC
    betas = _betas()
    rng = np.random.default_rng(0)
    # batch 1: the reference wrapper's [B]-shaped alpha_t only broadcasts
    # against [B, C, T] when B == 1 (its real usage, tts_infer batch 1)
    x = rng.normal(size=(1, 8, 16)).astype(np.float32)

    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(betas))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    uni_pc = UniPC(model_fn, ref_ns, variant="bh2")
    with torch.no_grad():
        ref_out = uni_pc.sample(torch.tensor(x), steps=steps, order=2,
                                skip_type="time_uniform",
                                method="multistep").numpy()

    ours = sample_unipc(_toy_x0_jax, NoiseScheduleVP(betas), jnp.asarray(x),
                        steps=steps, order=2)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("steps,order", [(5, 2), (20, 2), (6, 1)])
def test_dpmpp_parity(steps, order):
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    betas = _betas()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)

    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(betas))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    solver = DPM_Solver(model_fn, ref_ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        ref_out = solver.sample(torch.tensor(x), steps=steps, order=order,
                                skip_type="time_uniform",
                                method="multistep").numpy()

    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(betas), jnp.asarray(x),
                        steps=steps, order=order)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


def test_ddim_oracle():
    """DDIM loop vs a straight numpy transcription of the update rule
    (model3.py:1077-1112), using the toy x0 model."""
    gd = GaussianDiffusion.create(1000)
    steps = 10
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 4)).astype(np.float32)

    # numpy oracle
    alphas_cumprod = np.asarray(gd.alphas_cumprod)
    times = np.linspace(-1, 999, steps + 1).astype(int)
    times = list(reversed(times.tolist()))
    img = x.copy()
    for time, time_next in zip(times[:-1], times[1:]):
        t = np.full((1,), time, np.int64)
        x_start = np.tanh(img * (1 + time / 1000.0)) * 0.5
        sqrt_recip = np.sqrt(1.0 / alphas_cumprod[time])
        sqrt_recipm1 = np.sqrt(1.0 / alphas_cumprod[time] - 1)
        pred_noise = (sqrt_recip * img - x_start) / sqrt_recipm1
        if time_next < 0:
            img = x_start
            continue
        alpha_next = alphas_cumprod[time_next]
        c = np.sqrt(1 - alpha_next)
        img = x_start * np.sqrt(alpha_next) + c * pred_noise

    # drive the jnp update rules manually with the same fixed x_T
    def model_fn(xx, tt):
        t0 = tt[0].astype(xx.dtype)
        return jnp.tanh(xx * (1 + t0 / 1000.0)) * 0.5

    pairs = np.array(list(zip(times[:-1], times[1:])), np.int32)
    img_j = jnp.asarray(x)
    for time, time_next in pairs:
        bt = jnp.full((1,), int(time), jnp.int32)
        x_start = model_fn(img_j, bt)
        pred_noise = gd.predict_noise_from_start(img_j, bt, x_start)
        if time_next < 0:
            img_j = x_start
            continue
        alpha_next = gd.alphas_cumprod[int(time_next)]
        c = jnp.sqrt(1 - alpha_next)
        img_j = x_start * jnp.sqrt(alpha_next) + c * pred_noise

    np.testing.assert_allclose(np.asarray(img_j), img, atol=1e-5)
