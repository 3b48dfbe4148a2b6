"""Dropout PRNG implementation selection in the train step.

The TPU-native default routes dropout masks through the hardware RNG
("rbg"); "threefry" keeps the portable counter-based stream. Either way the
step must run, produce finite loss, and give a *different* dropout stream
per step (the key is folded with the step counter).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.core.config import (Config, DataConfig,
                                       DiffusionEncoderConfig, TrainConfig,
                                       VitsConfig)
from diff_vits_tpu.models.diff_vits import DiffVits
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train.trainer import (dropout_key, make_optimizer,
                                         make_train_step)


def _tiny(impl):
    return Config(
        train=TrainConfig(train_batch_size=2, timesteps=20,
                          compute_dtype="float32", dropout_rng_impl=impl),
        data=DataConfig(n_mel_channels=8, max_text_len=8, max_mel_len=16),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=2,
                        posterior_in_channels=8, posterior_n_layers=2),
    )


def test_dropout_key_impls():
    k = jax.random.PRNGKey(7)
    kt = dropout_key(k, "threefry")
    kr = dropout_key(k, "rbg")
    # threefry path passes the legacy uint32[2] key through unchanged
    assert kt.shape == k.shape and kt.dtype == k.dtype
    assert jnp.issubdtype(kr.dtype, jax.dtypes.prng_key)
    # rbg key is usable by flax-style fold_in + bernoulli
    m = jax.random.bernoulli(jax.random.fold_in(kr, 3), 0.5, (32,))
    assert m.dtype == jnp.bool_
    # deterministic: same base key -> same rbg key data
    kr2 = dropout_key(k, "rbg")
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(kr)),
                                  np.asarray(jax.random.key_data(kr2)))


@pytest.mark.slow  # two full train-step XLA compiles (~2-4 min each on CPU)
@pytest.mark.golden  # 'golden' tier: ~6 min aggregate
@pytest.mark.parametrize("impl", ["rbg", "threefry"])
def test_train_step_runs_with_impl(impl):
    cfg = _tiny(impl)
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
             "step": jnp.asarray(0, jnp.int32), "rng": key}
    step_fn = jax.jit(make_train_step(model, tx, cfg))
    state1, m1 = step_fn(state, batch)
    assert np.isfinite(float(m1["loss/all"]))
    state2, m2 = step_fn(state1, batch)
    assert np.isfinite(float(m2["loss/all"]))
    # same batch, new step counter -> different dropout stream -> the
    # stochastic parts of the loss differ
    assert float(m1["loss/all"]) != float(m2["loss/all"])
