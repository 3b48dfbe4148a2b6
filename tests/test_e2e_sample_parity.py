"""North-star correctness gate: full-chain sampling parity vs the reference.

Transplants an entire reference ``NaturalSpeech2`` state_dict and compares
``model3.sample`` (text -> VITS prior -> solver over the UNet -> mel)
against our ``synthesize`` with identical injected initial noise and zeroed
prior noise (PRNG streams can't match across frameworks, so noise is an
input — SURVEY.md §7.3.2). Covers both BASELINE.json fixed-seed gates:
30-step UniPC (the reference default, model3.py:1186) and 20-step
DPM-Solver++ multistep order 2 ("mel allclose at 20-step DPM-Solver").
The reference's own ``sample(sample_method='dpmsolver')`` branch is dead
code (tuple-call of ``vits.infer`` + transposed shape math,
model3.py:1139-1141), so the DPM case drives ``sampler.dpm_solver`` over
the reference UNet exactly the way the working UniPC branch does.
"""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

from tests import ref_stubs  # noqa: E402

ref_stubs.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_vits_tpu.core.config import (  # noqa: E402
    Config, DataConfig, DiffusionEncoderConfig, TrainConfig, VitsConfig)
from diff_vits_tpu.models.diff_vits import DiffVits, synthesize  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow

torch.manual_seed(0)


class _DummyVocos:
    def to(self, device):
        return self

    def decode(self, mel):
        return torch.zeros(mel.shape[0], 1, 8)


@pytest.fixture(scope="module")
def setup():
    """One reference build + transplant shared by every sampler case."""
    import model3
    from text import symbols

    # small-but-faithful config; vits hidden must stay 256 (the reference
    # UNet duration predictor hard-codes it, model3.py:291-301)
    ref_cfg = {
        "data": {"window_size": 1024},
        "train": {"timesteps": 1000},
        "vits": {
            "inter_channels": 128, "hidden_channels": 256,
            "filter_channels": 64, "n_heads": 2, "n_layers": 3,
            "kernel_size": 3, "p_dropout": 0.0, "gin_channels": 32,
        },
        "diffusion_encoder": {
            "in_channels": 100, "out_channels": 100,
            "hidden_channels": 128, "n_heads": 8, "p_dropout": 0.0,
        },
    }
    ref = model3.NaturalSpeech2(ref_cfg).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(2)
    b, t_x, s = 1, 10, 36
    data = dict(
        text=rng.integers(1, len(symbols), (b, t_x)).astype(np.int64),
        tone=rng.integers(0, 6, (b, t_x)).astype(np.int64),
        lang=np.zeros((b, t_x), np.int64),
        refer=rng.normal(size=(b, s, 100)).astype(np.float32),
        text_lengths=np.array([t_x], np.int64),
        refer_lengths=np.array([s], np.int64),
    )

    cfg = Config(
        train=TrainConfig(timesteps=1000),
        data=DataConfig(),
        vits=VitsConfig(inter_channels=128, hidden_channels=256,
                        filter_channels=64, n_heads=2, n_layers=3,
                        kernel_size=3, p_dropout=0.0, gin_channels=32),
        diffusion_encoder=DiffusionEncoderConfig(p_dropout=0.0),
    )
    model = DiffVits(cfg, n_vocab=len(symbols))
    params = {"params": tp.diff_vits_params(
        state, n_layers_enc=3, posterior_layers=16, gin=32)}
    return ref, model, params, data


def _run_ours(model, params, data, mel_ref, init_noise, method, steps):
    t_ref = mel_ref.shape[1]
    mel, out_lengths = synthesize(
        model, params, jnp.asarray(data["text"].astype(np.int32)),
        jnp.asarray(data["text_lengths"].astype(np.int32)),
        jnp.asarray(data["refer"]),
        jnp.asarray(data["refer_lengths"].astype(np.int32)),
        jnp.asarray(data["tone"].astype(np.int32)),
        jnp.asarray(data["lang"].astype(np.int32)),
        key=jax.random.PRNGKey(0), sampling_steps=steps,
        sample_method=method, noise_scale=0.0, max_len=t_ref,
        init_noise=jnp.asarray(init_noise))
    assert int(out_lengths[0]) == t_ref, (int(out_lengths[0]), t_ref)
    np.testing.assert_allclose(np.asarray(mel), mel_ref, atol=5e-3)


@pytest.mark.slow
def test_e2e_unipc_sample_parity(setup, monkeypatch):
    ref, model, params, data = setup

    # zero the prior noise; capture + fix the initial diffusion noise
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    captured = {}
    real_randn = torch.randn

    def fixed_randn(*shape, **kw):
        arr = real_randn(*shape, generator=torch.Generator().manual_seed(7),
                         **{k: v for k, v in kw.items() if k != "device"})
        captured["noise"] = arr.clone()
        return arr

    monkeypatch.setattr(torch, "randn", fixed_randn)

    with torch.no_grad():
        _, mel_ref = ref.sample(
            torch.tensor(data["text"]),
            torch.tensor(data["refer"]).transpose(1, 2),
            torch.tensor(data["text_lengths"]),
            torch.tensor(data["refer_lengths"]),
            torch.tensor(data["tone"]), torch.tensor(data["lang"]),
            _DummyVocos(), sample_method="unipc")
    mel_ref = mel_ref.numpy().transpose(0, 2, 1)  # [B, Ty, 100]

    init_noise = captured["noise"].numpy().transpose(0, 2, 1)  # [B, Ty, 100]
    assert init_noise.shape[1] == mel_ref.shape[1]
    _run_ours(model, params, data, mel_ref, init_noise, "unipc", 30)


@pytest.mark.slow
def test_e2e_dpmsolver20_sample_parity(setup, monkeypatch):
    """BASELINE.json: mel allclose at 20-step DPM-Solver, fixed seed."""
    from sampler.dpm_solver import (NoiseScheduleVP as RefNS, model_wrapper,
                                    DPM_Solver)
    ref, model, params, data = setup

    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    with torch.no_grad():
        content, refer_out = ref.vits.infer(
            torch.tensor(data["text"]), torch.tensor(data["text_lengths"]),
            torch.tensor(data["refer"]).transpose(1, 2),
            torch.tensor(data["refer_lengths"]),
            torch.tensor(data["tone"]), torch.tensor(data["lang"]))
        noise = torch.randn(
            (content.shape[0], ref.dim, content.shape[2]),
            generator=torch.Generator().manual_seed(7))
        model_fn = model_wrapper(
            ref.sample_fun, RefNS(schedule="discrete", betas=ref.betas),
            model_type="x_start",
            model_kwargs={"data": (content, refer_out,
                                   torch.tensor(data["text_lengths"]),
                                   torch.tensor(data["refer_lengths"]))})
        solver = DPM_Solver(model_fn, RefNS(schedule="discrete",
                                            betas=ref.betas),
                            algorithm_type="dpmsolver++")
        mel_ref = solver.sample(noise, steps=20, order=2,
                                skip_type="time_uniform",
                                method="multistep")
    mel_ref = mel_ref.numpy().transpose(0, 2, 1)  # [B, Ty, 100]
    init_noise = noise.numpy().transpose(0, 2, 1)
    _run_ours(model, params, data, mel_ref, init_noise, "dpmsolver", 20)


@pytest.mark.slow
def test_e2e_training_loss_parity(setup, monkeypatch):
    """Full NaturalSpeech2.forward loss parity (SURVEY §7.2 step 6).

    Exercises the training-only chain the sampling goldens never touch:
    posterior encode -> MAS (noise-annealed path disabled by zeroing) ->
    duration MSE -> prior-expansion KL -> q_sample at an injected t with
    injected noise -> SNR-weighted diffusion MSE -> 40*diff+dur+kl
    (model3.py:1213-1255). Randomness is removed identically on both
    sides: posterior/MAS eps = 0, fixed t, fixed q_sample noise, and
    refer1 == refer2 so the reference's coin flip (model3.py:1231) is
    moot. The reference forward requires use_noise_scaled_mas=True (with
    it False, `current_mas_noise_scale` is read unbound -> NameError, a
    reference defect) and the module-global `step`.
    """
    import model3
    ref, model, params, data = setup

    t_y = 40
    rng = np.random.default_rng(11)
    spec = rng.normal(size=(1, t_y, 100)).astype(np.float32)
    spec_lengths = np.array([37], np.int64)
    q_noise = rng.normal(size=(1, t_y, 100)).astype(np.float32)
    t_fixed = 437

    monkeypatch.setattr(model3, "step", 0, raising=False)
    monkeypatch.setattr(ref.vits, "use_noise_scaled_mas", True)

    def fake_randn_like(x):
        if x.shape[1] == 100:  # q_sample noise on [B, 100, Ty]
            return torch.tensor(q_noise.transpose(0, 2, 1))
        return torch.zeros_like(x)  # posterior eps, MAS anneal noise

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    monkeypatch.setattr(
        torch, "randint",
        lambda *a, **k: torch.full((1,), t_fixed, dtype=torch.long))

    refer_t = torch.tensor(data["refer"]).transpose(1, 2)
    batch = (
        torch.tensor(data["text"]), torch.tensor(spec.transpose(0, 2, 1)),
        refer_t, refer_t, torch.zeros(1),
        torch.tensor(data["text_lengths"]),
        torch.tensor(spec_lengths),
        torch.tensor(data["refer_lengths"]),
        torch.tensor(data["refer_lengths"]),
        torch.tensor(data["tone"]), torch.tensor(data["lang"]))
    with torch.no_grad():
        (loss_ref, diff_ref, len_ref, kl_ref, _klph, out_ref,
         _target) = ref(batch)

    loss, (metrics, model_out, _tgt) = model.apply(
        params, jnp.asarray(data["text"].astype(np.int32)),
        jnp.asarray(data["text_lengths"].astype(np.int32)),
        jnp.asarray(spec), jnp.asarray(spec_lengths.astype(np.int32)),
        jnp.asarray(data["refer"]),
        jnp.asarray(data["refer_lengths"].astype(np.int32)),
        jnp.asarray(data["tone"].astype(np.int32)),
        jnp.asarray(data["lang"].astype(np.int32)),
        rng=None, t=jnp.full((1,), t_fixed, jnp.int32),
        noise=jnp.asarray(q_noise))

    np.testing.assert_allclose(np.asarray(model_out),
                               out_ref.numpy().transpose(0, 2, 1),
                               atol=5e-3)
    for ours, theirs, name in [
            (metrics["loss/diff"], diff_ref, "diff"),
            (metrics["loss/len"], len_ref, "len"),
            (metrics["loss/kl"], kl_ref, "kl"),
            (loss, loss_ref, "all")]:
        np.testing.assert_allclose(float(ours), float(theirs),
                                   rtol=5e-3, atol=5e-4, err_msg=name)
