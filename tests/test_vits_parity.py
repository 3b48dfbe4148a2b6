"""Full-stack integration parity: our VITS / DiffusionEncoder vs model3.

The whole reference VITS state_dict is transplanted; noise sources are
neutralized (torch.randn* monkeypatched to zeros, our noise_scale=0) so the
forward paths are deterministic and comparable end to end.
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

from diff_vits_tpu.core.config import Config, VitsConfig, DiffusionEncoderConfig  # noqa: E402
from diff_vits_tpu.models.vits import VITS as JVITS  # noqa: E402
from diff_vits_tpu.models.diffusion_encoder import DiffusionEncoder  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow

torch.manual_seed(0)


def _small_vits_cfg():
    # hidden_channels must stay 256: the reference's DurationPredictor_unet
    # hard-codes hidden 256 and requires in_channels == hidden (model3.py:
    # 291-301,740-742). Shrink layer counts instead.
    return VitsConfig(inter_channels=16, hidden_channels=256,
                      filter_channels=64, n_heads=2, n_layers=3,
                      posterior_in_channels=100, posterior_n_layers=16,
                      gin_channels=32)


def _build_ref_vits(cfg: VitsConfig):
    import model3
    from text import symbols
    ref = model3.VITS(
        len(symbols), 513,
        inter_channels=cfg.inter_channels,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        kernel_size=cfg.kernel_size,
        p_dropout=cfg.p_dropout,
        gin_channels=cfg.gin_channels,
    ).eval()
    # shrink the posterior WN to the test layer count
    return ref


@pytest.mark.slow
def test_vits_infer_parity(monkeypatch):
    import model3
    from text import symbols

    cfg = _small_vits_cfg()
    ref = _build_ref_vits(cfg)
    state = {f"vits.{k}": v for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(0)
    b, t_x, s = 2, 12, 40
    text = rng.integers(1, len(symbols), (b, t_x)).astype(np.int64)
    tone = rng.integers(0, 6, (b, t_x)).astype(np.int64)
    lang = np.zeros((b, t_x), np.int64)
    refer = rng.normal(size=(b, s, 100)).astype(np.float32)
    text_lengths = np.array([12, 9], np.int64)
    refer_lengths = np.array([40, 33], np.int64)

    # deterministic: zero noise
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    with torch.no_grad():
        content_ref, _ = ref.infer(
            torch.tensor(text), torch.tensor(text_lengths),
            torch.tensor(refer).transpose(1, 2), torch.tensor(refer_lengths),
            torch.tensor(tone), torch.tensor(lang), noise_scale=0.0)
    content_ref = content_ref.numpy().transpose(0, 2, 1)  # [B, Ty, C]

    model = JVITS(len(symbols), cfg)
    params = tp.vits_params(state, "vits", n_layers_enc=cfg.n_layers,
                            posterior_layers=16, gin=cfg.gin_channels)
    content, out_lengths = model.apply(
        {"params": params}, jnp.asarray(text.astype(np.int32)),
        jnp.asarray(text_lengths.astype(np.int32)),
        jnp.asarray(refer), jnp.asarray(refer_lengths.astype(np.int32)),
        jnp.asarray(tone.astype(np.int32)),
        jnp.asarray(lang.astype(np.int32)),
        noise_key=jax.random.PRNGKey(0), noise_scale=0.0,
        max_len=content_ref.shape[1], method=JVITS.infer)

    t_ref = content_ref.shape[1]
    assert int(out_lengths.max()) == t_ref, (int(out_lengths.max()), t_ref)
    np.testing.assert_allclose(np.asarray(content)[:, :t_ref], content_ref,
                               atol=2e-3)


@pytest.mark.slow
def test_diffusion_encoder_parity():
    import model3

    ref = model3.Diffusion_Encoder(
        in_channels=100, out_channels=100, hidden_channels=128,
        n_heads=8, p_dropout=0.2).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(1)
    b, t, s = 2, 40, 24
    x = rng.normal(size=(b, t, 100)).astype(np.float32)
    cond = rng.normal(size=(b, t, 128)).astype(np.float32)
    prompt = rng.normal(size=(b, s, 100)).astype(np.float32)
    cond_lengths = np.array([40, 32], np.int64)
    prompt_lengths = np.array([24, 17], np.int64)
    tt = np.array([7, 615], np.int64)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(x).transpose(1, 2),
            (torch.tensor(cond).transpose(1, 2),
             torch.tensor(prompt).transpose(1, 2),
             torch.tensor(cond_lengths), torch.tensor(prompt_lengths)),
            torch.tensor(tt))
    out_ref = out_ref.numpy().transpose(0, 2, 1)

    cfg = DiffusionEncoderConfig()
    model = DiffusionEncoder(cfg)
    params = tp.diffusion_encoder_params(state, "")
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(tt),
                      jnp.asarray(cond), jnp.asarray(prompt),
                      jnp.asarray(cond_lengths.astype(np.int32)),
                      jnp.asarray(prompt_lengths.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-3)
