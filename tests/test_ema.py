"""EMA parameter tracking in the train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.core.config import (Config, DataConfig,
                                       DiffusionEncoderConfig, TrainConfig,
                                       VitsConfig)
from diff_vits_tpu.models.diff_vits import DiffVits
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train.trainer import make_optimizer, make_train_step

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_ema_tracks_params():
    cfg = Config(
        train=TrainConfig(train_batch_size=2, timesteps=20,
                          compute_dtype="float32", use_ema=True,
                          ema_decay=0.5),
        data=DataConfig(n_mel_channels=8, max_text_len=8, max_mel_len=16),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=3,
                        posterior_in_channels=8, posterior_n_layers=2),
    )
    model = DiffVits(cfg, n_vocab=len(symbols))
    tx = make_optimizer(cfg)

    rng = np.random.default_rng(0)
    b, t_x, t_y, s = 2, 6, 16, 8
    batch = {
        "text": jnp.asarray(rng.integers(1, 50, (b, t_x)), jnp.int32),
        "tone": jnp.zeros((b, t_x), jnp.int32),
        "language": jnp.zeros((b, t_x), jnp.int32),
        "spec": jnp.asarray(rng.normal(size=(b, t_y, 8)), jnp.float32),
        "refer": jnp.asarray(rng.normal(size=(b, s, 8)), jnp.float32),
        "text_lengths": jnp.full(b, t_x, jnp.int32),
        "spec_lengths": jnp.full(b, t_y, jnp.int32),
        "refer_lengths": jnp.full(b, s, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, batch["text"],
        batch["text_lengths"], batch["spec"], batch["spec_lengths"],
        batch["refer"], batch["refer_lengths"], batch["tone"],
        batch["language"], rng=key)["params"]
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32), "rng": key,
             "ema_params": jax.tree_util.tree_map(
                 lambda p: p.astype(jnp.float32), params)}

    step_fn = jax.jit(make_train_step(model, tx, cfg))
    state1, m1 = step_fn(state, batch)
    assert np.isfinite(float(m1["loss/all"]))

    # after one step: ema = 0.5 * p0 + 0.5 * p1
    leaf0 = params["vits"]["enc_p"]["emb"]["embedding"]
    leaf1 = state1["params"]["vits"]["enc_p"]["emb"]["embedding"]
    ema1 = state1["ema_params"]["vits"]["enc_p"]["emb"]["embedding"]
    np.testing.assert_allclose(np.asarray(ema1),
                               0.5 * np.asarray(leaf0)
                               + 0.5 * np.asarray(leaf1), atol=1e-6)
    # params moved, ema lags
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
    state2, _ = step_fn(state1, batch)
    assert not np.allclose(np.asarray(state2["ema_params"]
                                      ["vits"]["enc_p"]["emb"]["embedding"]),
                           np.asarray(ema1))


@pytest.mark.slow
def test_ema_state_survives_donated_step():
    """Regression (r5): the Trainer builds ema_params from fp32 params,
    where ``astype(float32)`` is a no-op returning the SAME buffer — an
    EMA tree aliasing the params tree crashes the production DONATED step
    with 'Attempt to donate the same buffer twice' at execute time. The
    undonated test above could never see it. The 500-step recommended-
    config convergence run hit this on the real chip."""
    cfg = Config(
        train=TrainConfig(train_batch_size=2, timesteps=20,
                          compute_dtype="float32", use_ema=True,
                          ema_decay=0.5),
        data=DataConfig(n_mel_channels=8, max_text_len=8, max_mel_len=16),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=3,
                        posterior_in_channels=8, posterior_n_layers=2),
    )
    model = DiffVits(cfg, n_vocab=len(symbols))
    tx = make_optimizer(cfg)
    rng = np.random.default_rng(0)
    b, t_x, t_y, s = 2, 6, 16, 8
    batch = {
        "text": jnp.asarray(rng.integers(1, 50, (b, t_x)), jnp.int32),
        "tone": jnp.zeros((b, t_x), jnp.int32),
        "language": jnp.zeros((b, t_x), jnp.int32),
        "spec": jnp.asarray(rng.normal(size=(b, t_y, 8)), jnp.float32),
        "refer": jnp.asarray(rng.normal(size=(b, s, 8)), jnp.float32),
        "text_lengths": jnp.full(b, t_x, jnp.int32),
        "spec_lengths": jnp.full(b, t_y, jnp.int32),
        "refer_lengths": jnp.full(b, s, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, batch["text"],
        batch["text_lengths"], batch["spec"], batch["spec_lengths"],
        batch["refer"], batch["refer_lengths"], batch["tone"],
        batch["language"], rng=key)["params"]
    # the Trainer's recipe: fp32 source params -> ema copy must be a real
    # copy, not an astype alias
    ema = jax.tree_util.tree_map(
        lambda p: jnp.array(p, jnp.float32, copy=True), params)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32), "rng": key,
             "ema_params": ema}
    step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    state, m = step_fn(state, batch)   # raises on aliased buffers
    assert np.isfinite(float(m["loss/all"]))
    state, m = step_fn(state, batch)   # and the returned state re-donates
    assert np.isfinite(float(m["loss/all"]))
