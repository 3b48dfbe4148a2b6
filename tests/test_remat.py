"""Rematerialization policies of the train step (train.remat_policy).

The b=32 production step is HBM-bandwidth-bound (bench.py mfu roofline:
arithmetic intensity ~29 flops/byte vs the v5e balance point of ~240), so
the Trainer exposes jax.checkpoint policies that trade recompute FLOPs for
saved-activation bytes. Remat must never change the math: every policy has
to produce the same loss and the same updated parameters.
"""
import dataclasses

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


def _tiny(policy):
    return Config(
        train=TrainConfig(train_batch_size=2, timesteps=20,
                          compute_dtype="float32", remat_policy=policy),
        data=DataConfig(n_mel_channels=8, max_text_len=8, max_mel_len=16),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=2,
                        posterior_in_channels=8, posterior_n_layers=2),
    )


def _batch():
    rng = np.random.default_rng(0)
    b, t_x, t_y, s = 2, 6, 16, 8
    return {
        "text": jnp.asarray(rng.integers(1, 50, (b, t_x)), jnp.int32),
        "tone": jnp.zeros((b, t_x), jnp.int32),
        "language": jnp.zeros((b, t_x), jnp.int32),
        "spec": jnp.asarray(rng.normal(size=(b, t_y, 8)), jnp.float32),
        "refer": jnp.asarray(rng.normal(size=(b, s, 8)), jnp.float32),
        "text_lengths": jnp.full(b, t_x, jnp.int32),
        "spec_lengths": jnp.full(b, t_y, jnp.int32),
        "refer_lengths": jnp.full(b, s, jnp.int32),
    }


@pytest.mark.slow  # three full train-step XLA compiles
def test_remat_policies_identical_step():
    batch = _batch()
    key = jax.random.PRNGKey(0)
    results = {}
    for policy in ("none", "dots", "full"):
        cfg = _tiny(policy)
        model = DiffVits(cfg, n_vocab=len(symbols))
        tx = make_optimizer(cfg)
        params = model.init(
            {"params": key, "dropout": key}, batch["text"],
            batch["text_lengths"], batch["spec"], batch["spec_lengths"],
            batch["refer"], batch["refer_lengths"], batch["tone"],
            batch["language"], rng=key)["params"]
        state = {"params": params, "opt_state": tx.init(params),
                 "step": jnp.asarray(0, jnp.int32), "rng": key}
        step_fn = jax.jit(make_train_step(model, tx, cfg))
        new_state, metrics = step_fn(state, batch)
        results[policy] = (float(metrics["loss/all"]),
                           jax.device_get(new_state["params"]))
    base_loss, base_params = results["none"]
    assert np.isfinite(base_loss)
    lr = 1e-4  # TrainConfig.train_lr default
    for policy in ("dots", "full"):
        loss, params = results[policy]
        assert abs(loss - base_loss) < 1e-4 * max(abs(base_loss), 1.0), \
            (policy, loss, base_loss)
        # Adam's first step moves every component by ~±lr (zero-initialized
        # second moment makes the update sign(g)*lr); remat's float
        # reassociation can flip the sign of noise-level gradients — on
        # bias vectors whose true gradient is ~0, nearly every element is
        # flip-prone. The principled invariant is a 2*lr band per element
        # (measured: 'full' is bit-exact vs 'none'; 'dots' peaks at
        # 1.7e-4 on attention-key biases, whose gradient is provably zero
        # under softmax).
        flat_b = jax.tree_util.tree_leaves(base_params)
        flat_p = jax.tree_util.tree_leaves(params)
        for a, b in zip(flat_b, flat_p):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=0, atol=2.5 * lr)


@pytest.mark.slow  # one train-step XLA compile
def test_gradient_accumulation_step():
    """The scan-based accumulation path (production single-chip config,
    train.gradient_accumulate_every=4 measured 1.29x vs monolithic b=32):
    batches carry a leading accum axis; metrics come back as micro-means;
    one optimizer update per outer step."""
    cfg = _tiny("none")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       gradient_accumulate_every=2))
    model = DiffVits(cfg, n_vocab=len(symbols))
    tx = make_optimizer(cfg)
    flat = _batch()
    accum_batch = {k: jnp.stack([v, v]) for k, v in flat.items()}
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, flat["text"],
        flat["text_lengths"], flat["spec"], flat["spec_lengths"],
        flat["refer"], flat["refer_lengths"], flat["tone"],
        flat["language"], rng=key)["params"]
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32), "rng": key}
    step_fn = jax.jit(make_train_step(model, tx, cfg))
    new_state, metrics = step_fn(state, accum_batch)
    assert np.isfinite(float(metrics["loss/all"]))
    assert int(new_state["step"]) == 1
    # params moved exactly once (Adam step-1 update is +-lr per element)
    deltas = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32)).max(),
        params, new_state["params"])
    assert max(jax.tree_util.tree_leaves(deltas)) <= 1.01e-4


def test_remat_unknown_policy_raises():
    cfg = _tiny("banana")
    model = DiffVits(cfg, n_vocab=len(symbols))
    with pytest.raises(ValueError, match="remat_policy"):
        make_train_step(model, make_optimizer(cfg), cfg)
