"""conv / sdp duration-predictor variants: loss + infer run end to end.

(The reference keeps these constructed-but-commented, model3.py:734-742;
model.py/model2.py use the conv DP. A review found the dispatch broken —
this locks the fix.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.core.config import VitsConfig
from diff_vits_tpu.models.vits import VITS
from diff_vits_tpu.text.symbols import symbols

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


def _cfg(dp):
    return VitsConfig(inter_channels=8, hidden_channels=16,
                      filter_channels=16, n_heads=2, n_layers=3,
                      posterior_in_channels=8, posterior_n_layers=2,
                      gin_channels=16, duration_predictor=dp)


@pytest.mark.slow
@pytest.mark.parametrize("dp", ["conv", "sdp"])
def test_duration_variant_forward_and_infer(dp):
    cfg = _cfg(dp)
    model = VITS(len(symbols), cfg)
    rng = np.random.default_rng(0)
    b, t_x, t_y = 2, 6, 16
    text = jnp.asarray(rng.integers(1, 50, (b, t_x)), jnp.int32)
    tone = jnp.zeros((b, t_x), jnp.int32)
    lang = jnp.zeros((b, t_x), jnp.int32)
    spec = jnp.asarray(rng.normal(size=(b, t_y, 8)), jnp.float32)
    text_lengths = jnp.asarray([t_x, t_x - 2], jnp.int32)
    spec_lengths = jnp.asarray([t_y, t_y - 4], jnp.int32)
    key = jax.random.PRNGKey(0)

    (content, y_lengths, (l_len, l_kl, l_ph)), params = \
        model.init_with_output(
            {"params": key, "dropout": key}, text, text_lengths, spec,
            spec_lengths, tone, lang, rngs_noise_key=key,
            deterministic=True)
    assert np.isfinite(float(l_len)), dp
    assert np.isfinite(float(l_kl))
    assert content.shape[0] == b

    out, out_lengths = model.apply(
        params, text, text_lengths, spec, spec_lengths, tone, lang,
        noise_key=key, max_len=32, method=VITS.infer)
    assert out.shape[1] == 32
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out_lengths) >= 1).all()
