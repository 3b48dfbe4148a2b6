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


def test_bf16_param_residency_matches_fp32():
    """Serving-precision check (core/params.py): synthesize with the model
    in bf16 compute + bf16-resident params stays close to the fp32 run —
    the CLIs' default serving mode must not change the output materially."""
    from diff_vits_tpu.core.params import cast_float_params
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.text.symbols import symbols

    cfg = ge._tiny_config()
    batch = ge._tiny_batch()
    key = jax.random.PRNGKey(0)

    def run(dtype, params=None):
        model = DiffVits(cfg, n_vocab=len(symbols), dtype=dtype)
        if params is None:
            params = model.init(
                {"params": key, "dropout": key}, batch["text"],
                batch["text_lengths"], batch["spec"],
                batch["spec_lengths"], batch["refer"],
                batch["refer_lengths"], batch["tone"], batch["language"],
                rng=key)
        mel, lengths = synthesize(
            model, params, jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]), jnp.asarray(batch["refer"]),
            jnp.asarray(batch["refer_lengths"]), jnp.asarray(batch["tone"]),
            jnp.asarray(batch["language"]), key=key, sampling_steps=4,
            sample_method="unipc", max_len=64)
        return params, np.asarray(mel, np.float32), np.asarray(lengths)

    params, mel32, len32 = run(jnp.float32)
    _, mel16, len16 = run(jnp.bfloat16, cast_float_params(params))

    assert np.isfinite(mel16).all()
    assert (len16 == len32).all()
    # same trajectory modulo bf16 rounding: high correlation, close stats.
    # (0.9 bar: a random-init tiny model + 4 sampler steps amplifies bf16
    # rounding far more than the trained production model, where the bench
    # input's mel std matches to 1e-3 — measured 0.94 here.)
    corr = np.corrcoef(mel32.ravel(), mel16.ravel())[0, 1]
    assert corr > 0.9, corr
    assert abs(mel16.std() - mel32.std()) < 0.05 * max(mel32.std(), 1e-3)
