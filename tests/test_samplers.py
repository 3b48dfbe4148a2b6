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

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# Extended DPM-Solver++ surface (SURVEY §2.6: singlestep, order 3, time
# grids, taylor flavor, dynamic thresholding, model_wrapper types)
# ---------------------------------------------------------------------------

def _ref_solver(correcting_x0_fn=None, model_type="x_start",
                torch_model=None, **wrap_kwargs):
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(torch_model or _toy_x0_torch, ref_ns,
                             model_type=model_type, **wrap_kwargs)
    return DPM_Solver(model_fn, ref_ns, algorithm_type="dpmsolver++",
                      correcting_x0_fn=correcting_x0_fn)


@pytest.mark.parametrize("steps,lof", [(12, True), (6, True), (5, False)])
def test_dpmpp_order3_multistep_parity(steps, lof):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = _ref_solver().sample(
            torch.tensor(x), steps=steps, order=3, skip_type="time_uniform",
            method="multistep", lower_order_final=lof).numpy()
    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=steps, order=3,
                        lower_order_final=lof)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("method,steps,order", [
    ("singlestep", 9, 3), ("singlestep", 10, 3), ("singlestep", 7, 2),
    ("singlestep_fixed", 8, 2), ("singlestep_fixed", 9, 3)])
def test_dpmpp_singlestep_parity(method, steps, order):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = _ref_solver().sample(
            torch.tensor(x), steps=steps, order=order,
            skip_type="time_uniform", method=method).numpy()
    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=steps, order=order,
                        method=method)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("skip_type", ["logSNR", "time_quadratic"])
def test_dpmpp_time_grid_parity(skip_type):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = _ref_solver().sample(
            torch.tensor(x), steps=12, order=2, skip_type=skip_type,
            method="multistep").numpy()
    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=12, order=2,
                        skip_type=skip_type)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("order,method", [(2, "multistep"), (3, "multistep"),
                                          (3, "singlestep")])
def test_dpmpp_taylor_flavor_parity(order, method):
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = _ref_solver().sample(
            torch.tensor(x), steps=12, order=order,
            skip_type="time_uniform", method=method,
            solver_type="taylor").numpy()
    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=12, order=order, method=method,
                        solver_type="taylor")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


def test_dpmpp_dynamic_thresholding_and_denoise_parity():
    rng = np.random.default_rng(7)
    x = 3.0 * rng.normal(size=(2, 4, 8)).astype(np.float32)

    def big_x0_torch(xx, tt, **kw):
        return _toy_x0_torch(xx, tt) * 4.0  # exceeds [-1, 1] -> clamps

    def big_x0_jax(xx, tt):
        return _toy_x0_jax(xx, tt) * 4.0

    with torch.no_grad():
        ref_out = _ref_solver(correcting_x0_fn="dynamic_thresholding",
                              torch_model=big_x0_torch).sample(
            torch.tensor(x), steps=8, order=2, skip_type="time_uniform",
            method="multistep", denoise_to_zero=True).numpy()
    ours = sample_dpmpp(big_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=8, order=2,
                        correcting_x0_fn="dynamic_thresholding",
                        denoise_to_zero=True)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)


@pytest.mark.parametrize("model_type", ["noise", "v", "score"])
def test_wrap_model_types_parity(model_type):
    """Each parameterization drives the same solve on both sides."""
    from diff_vits_tpu.diffusion.dpm_solver import wrap_model

    def toy_torch(xx, tt, **kw):
        t = tt.reshape(-1, *([1] * (xx.dim() - 1))).to(xx.dtype)
        return torch.tanh(xx * (1 + t / 1000.0)) * 0.3

    def toy_jax(xx, tt):
        t = tt.reshape(-1, *([1] * (xx.ndim - 1))).astype(xx.dtype)
        return jnp.tanh(xx * (1 + t / 1000.0)) * 0.3

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = _ref_solver(model_type=model_type,
                              torch_model=toy_torch).sample(
            torch.tensor(x), steps=10, order=2, skip_type="time_uniform",
            method="multistep").numpy()
    ns = NoiseScheduleVP(_betas())
    x0_fn = wrap_model(toy_jax, ns, model_type=model_type)
    ours = sample_dpmpp(x0_fn, ns, jnp.asarray(x), steps=10, order=2)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_wrap_model_classifier_free_guidance_parity():
    from diff_vits_tpu.diffusion.dpm_solver import wrap_model

    def toy_cond_torch(xx, tt, cond, **kw):
        t = tt.reshape(-1, *([1] * (xx.dim() - 1))).to(xx.dtype)
        return torch.tanh(xx * (1 + t / 1000.0)) * 0.3 + 0.1 * cond

    def toy_cond_jax(xx, tt, cond):
        t = tt.reshape(-1, *([1] * (xx.ndim - 1))).astype(xx.dtype)
        return jnp.tanh(xx * (1 + t / 1000.0)) * 0.3 + 0.1 * cond

    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    cond = np.ones((1, 4, 8), np.float32)
    uncond = np.zeros((1, 4, 8), np.float32)
    with torch.no_grad():
        ref_out = _ref_solver(
            model_type="noise", torch_model=toy_cond_torch,
            guidance_type="classifier-free",
            condition=torch.tensor(cond),
            unconditional_condition=torch.tensor(uncond),
            guidance_scale=2.0).sample(
            torch.tensor(x), steps=10, order=2, skip_type="time_uniform",
            method="multistep").numpy()
    ns = NoiseScheduleVP(_betas())
    x0_fn = wrap_model(toy_cond_jax, ns, model_type="noise",
                       guidance_type="classifier-free",
                       condition=jnp.asarray(cond),
                       unconditional_condition=jnp.asarray(uncond),
                       guidance_scale=2.0)
    ours = sample_dpmpp(x0_fn, ns, jnp.asarray(x), steps=10, order=2)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


# ---------------------------------------------------------------------------
# Extended UniPC surface: orders 1-3, bh1/vary_coeff variants, grids
# ---------------------------------------------------------------------------

def _ref_unipc(x, steps, order, variant, skip_type="time_uniform",
               lower_order_final=True):
    from sampler.uni_pc import NoiseScheduleVP as RefNS, model_wrapper, UniPC
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    uni_pc = UniPC(model_fn, ref_ns, variant=variant)
    with torch.no_grad():
        return uni_pc.sample(torch.tensor(x), steps=steps, order=order,
                             skip_type=skip_type, method="multistep",
                             lower_order_final=lower_order_final).numpy()


@pytest.mark.parametrize("steps,order,variant,skip_type,lof", [
    (12, 3, "bh2", "time_uniform", True),
    (9, 3, "bh1", "time_uniform", True),
    (10, 3, "bh2", "logSNR", True),
    (10, 2, "bh2", "time_uniform", False),
    (2, 2, "bh2", "time_uniform", True),   # tail drops to order 1
    (3, 3, "bh2", "time_uniform", True),
    (8, 1, "bh1", "time_uniform", True),
])
def test_unipc_extended_parity(steps, order, variant, skip_type, lof):
    rng = np.random.default_rng(10)
    x = rng.normal(size=(1, 8, 16)).astype(np.float32)
    ref_out = _ref_unipc(x, steps, order, variant, skip_type, lof)
    ours = sample_unipc(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=steps, order=order,
                        variant=variant, skip_type=skip_type,
                        lower_order_final=lof)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


@pytest.mark.parametrize("steps,order", [(12, 2), (12, 3), (5, 3)])
def test_unipc_vary_coeff_parity(steps, order):
    rng = np.random.default_rng(12)
    x = rng.normal(size=(1, 8, 16)).astype(np.float32)
    ref_out = _ref_unipc(x, steps, order, "vary_coeff")
    ours = sample_unipc(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=steps, order=order,
                        variant="vary_coeff")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


# ---------------------------------------------------------------------------
# algorithm_type='dpmsolver' (noise form), adaptive method, inverse
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order,method", [(2, "multistep"), (3, "multistep"),
                                          (3, "singlestep")])
def test_dpm_noise_algorithm_parity(order, method):
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    rng = np.random.default_rng(13)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    solver = DPM_Solver(model_fn, ref_ns, algorithm_type="dpmsolver")
    with torch.no_grad():
        ref_out = solver.sample(torch.tensor(x), steps=12, order=order,
                                skip_type="time_uniform",
                                method=method).numpy()
    ours = sample_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=12, order=order, method=method,
                        algorithm_type="dpmsolver")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


@pytest.mark.parametrize("order", [2, 3])
def test_dpmpp_adaptive(order):
    """Adaptive solver: parity with the reference adaptive driver (same
    accept/reject trajectory at these tolerances) and accuracy against a
    dense multistep solve."""
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    rng = np.random.default_rng(14)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    solver = DPM_Solver(model_fn, ref_ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        ref_out = solver.sample(torch.tensor(x), order=order,
                                method="adaptive").numpy()
    ns = NoiseScheduleVP(_betas())
    ours = sample_dpmpp(_toy_x0_jax, ns, jnp.asarray(x), order=order,
                        method="adaptive")
    dense = sample_dpmpp(_toy_x0_jax, ns, jnp.asarray(x), steps=50, order=2)
    # coarse accuracy gate vs dense solve: the default adaptive tolerances
    # (atol 0.0078, rtol 0.05) land ~0.09 from the dense solution in the
    # reference too — this only guards against gross divergence
    np.testing.assert_allclose(np.asarray(ours), np.asarray(dense),
                               atol=0.15)
    # trajectory parity vs the reference adaptive driver
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3)


def test_dpmpp_inverse_parity():
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    from diff_vits_tpu.diffusion.dpm_solver import inverse_dpmpp
    rng = np.random.default_rng(15)
    x = 0.5 * rng.normal(size=(1, 4, 8)).astype(np.float32)
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    solver = DPM_Solver(model_fn, ref_ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        ref_out = solver.inverse(torch.tensor(x), steps=12, order=2,
                                 skip_type="time_uniform",
                                 method="multistep").numpy()
    ours = inverse_dpmpp(_toy_x0_jax, NoiseScheduleVP(_betas()),
                         jnp.asarray(x), steps=12, order=2)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


@pytest.mark.parametrize("variant,order", [("bh2", 2), ("vary_coeff", 3)])
def test_unipc_noise_prediction_parity(variant, order):
    from sampler.uni_pc import NoiseScheduleVP as RefNS, model_wrapper, UniPC
    rng = np.random.default_rng(16)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(_toy_x0_torch, ref_ns, model_type="x_start")
    uni_pc = UniPC(model_fn, ref_ns, algorithm_type="noise_prediction",
                   variant=variant)
    with torch.no_grad():
        ref_out = uni_pc.sample(torch.tensor(x), steps=12, order=order,
                                skip_type="time_uniform",
                                method="multistep").numpy()
    ours = sample_unipc(_toy_x0_jax, NoiseScheduleVP(_betas()),
                        jnp.asarray(x), steps=12, order=order,
                        variant=variant,
                        algorithm_type="noise_prediction")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)


def test_unipc_dynamic_thresholding_parity():
    from sampler.uni_pc import NoiseScheduleVP as RefNS, model_wrapper, UniPC
    rng = np.random.default_rng(17)
    x = 3.0 * rng.normal(size=(1, 4, 8)).astype(np.float32)

    def big_t(xx, tt, **kw):
        return _toy_x0_torch(xx, tt) * 4.0

    def big_j(xx, tt):
        return _toy_x0_jax(xx, tt) * 4.0

    ref_ns = RefNS(schedule="discrete", betas=torch.tensor(_betas()))
    model_fn = model_wrapper(big_t, ref_ns, model_type="x_start")
    uni_pc = UniPC(model_fn, ref_ns, variant="bh2",
                   correcting_x0_fn="dynamic_thresholding")
    with torch.no_grad():
        ref_out = uni_pc.sample(torch.tensor(x), steps=10, order=2,
                                skip_type="time_uniform",
                                method="multistep").numpy()
    ours = sample_unipc(big_j, NoiseScheduleVP(_betas()), jnp.asarray(x),
                        steps=10, order=2,
                        correcting_x0_fn="dynamic_thresholding")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4)
