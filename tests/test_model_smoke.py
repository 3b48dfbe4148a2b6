"""End-to-end smoke: tiny DiffVits training loss + gradients + synthesize,
plus the driver entry points (single-chip fn and 8-device dry run)."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


def test_training_loss_and_grads():
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss)), float(loss)

    grads = jax.grad(fn)(*args)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in leaves)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dryrun_multichip():
    ge.dryrun_multichip(8)


def test_synthesize_tiny():
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.text.symbols import symbols

    cfg = ge._tiny_config()
    model = DiffVits(cfg, n_vocab=len(symbols))
    batch = ge._tiny_batch()
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, batch["text"],
        batch["text_lengths"], batch["spec"], batch["spec_lengths"],
        batch["refer"], batch["refer_lengths"], batch["tone"],
        batch["language"], rng=key)

    for method in ("unipc", "dpmsolver"):
        mel, lengths = synthesize(
            model, params, jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["refer"]),
            jnp.asarray(batch["refer_lengths"]),
            jnp.asarray(batch["tone"]), jnp.asarray(batch["language"]),
            key=key, sampling_steps=4, sample_method=method, max_len=64)
        assert mel.shape == (2, 64, cfg.diffusion_encoder.out_channels)
        assert np.isfinite(np.asarray(mel)).all()
        assert (np.asarray(lengths) >= 1).all()
