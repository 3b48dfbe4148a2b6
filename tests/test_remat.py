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


@pytest.mark.slow  # three loss+grad XLA compiles
def test_remat_policies_identical_gradients():
    """Remat must not change the math: compare RAW gradients across
    policies with a tight per-leaf tolerance (ADVICE r4 — the previous
    post-Adam param check was nearly vacuous: Adam's first step moves
    every element by at most ±lr whatever the gradient). Float
    reassociation under remat legitimately perturbs near-zero gradients
    (e.g. attention-key biases, provably zero under softmax), so the
    tolerance is scaled per leaf by that leaf's gradient magnitude."""
    from diff_vits_tpu.train.trainer import make_loss_fn

    batch = _batch()
    key = jax.random.PRNGKey(0)
    grads, losses = {}, {}
    for policy in ("none", "dots", "full"):
        cfg = _tiny(policy)
        model = DiffVits(cfg, n_vocab=len(symbols))
        params = model.init(
            {"params": key, "dropout": key}, batch["text"],
            batch["text_lengths"], batch["spec"], batch["spec_lengths"],
            batch["refer"], batch["refer_lengths"], batch["tone"],
            batch["language"], rng=key)["params"]
        grad_fn = jax.jit(jax.value_and_grad(make_loss_fn(model, cfg),
                                             has_aux=True))
        (loss, _), g = grad_fn(params, batch,
                               jax.random.fold_in(key, 0), 0.01)
        losses[policy] = float(loss)
        grads[policy] = jax.device_get(g)
    assert np.isfinite(losses["none"])
    base_leaves, treedef = jax.tree_util.tree_flatten(grads["none"])
    # atol scaled by the GLOBAL gradient magnitude: leaves whose true
    # gradient is zero (attention-key biases under softmax) hold pure
    # rounding noise (~1e-8) that reassociation freely permutes — a
    # per-leaf scale would demand bit-exactness of that noise, while
    # elements this far below the gradient scale cannot affect training
    g_scale = max(float(np.abs(np.asarray(l, np.float32)).max())
                  for l in base_leaves)
    assert g_scale > 1e-3  # the batch produces real gradients
    for policy in ("dots", "full"):
        assert losses[policy] == pytest.approx(losses["none"], rel=1e-5)
        leaves = treedef.flatten_up_to(grads[policy])
        for a, b in zip(base_leaves, leaves):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-4, atol=1e-5 * g_scale,
                                       err_msg=policy)


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
