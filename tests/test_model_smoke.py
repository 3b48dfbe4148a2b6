"""End-to-end smoke: tiny DiffVits training loss + gradients + synthesize,
plus the driver entry points (single-chip fn and 8-device dry run)."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not
# slow'); also in the 'golden' tier — ~14 min of full-model CPU compiles
pytestmark = [pytest.mark.slow, pytest.mark.golden]


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

    def run(dtype, params=None, method="unipc"):
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
            sample_method=method, max_len=64)
        return params, np.asarray(mel, np.float32), np.asarray(lengths)

    params, mel32, len32 = run(jnp.float32)
    # intermediate rung (ADVICE r3): fp32-resident weights + bf16 compute.
    # Localizes a regression — if this rung fails the kernel compute path
    # dropped precision; if only the next rung fails, the weight cast did.
    _, mel16c, len16c = run(jnp.bfloat16, params)
    _, mel16, len16 = run(jnp.bfloat16, cast_float_params(params))

    assert np.isfinite(mel16c).all() and np.isfinite(mel16).all()
    assert (len16c == len32).all() and (len16 == len32).all()
    # same trajectory modulo bf16 rounding: high correlation, close stats.
    # (random-init tiny model + 4 sampler steps amplifies bf16 rounding far
    # more than the trained production model, where the bench input's mel
    # std matches to 1e-3 — measured corr 0.98 / 0.94 on the two rungs.)
    corr_c = np.corrcoef(mel32.ravel(), mel16c.ravel())[0, 1]
    assert corr_c > 0.95, corr_c
    corr = np.corrcoef(mel32.ravel(), mel16.ravel())[0, 1]
    assert corr > 0.9, corr
    assert abs(mel16c.std() - mel32.std()) < 0.03 * max(mel32.std(), 1e-3)
    assert abs(mel16.std() - mel32.std()) < 0.05 * max(mel32.std(), 1e-3)

    # second sampler (ADVICE r3): a precision regression confined to one
    # solver's update math must not slip past a unipc-only gate
    _, dmel32, dlen32 = run(jnp.float32, params, method="dpmsolver")
    _, dmel16, dlen16 = run(jnp.bfloat16, cast_float_params(params),
                            method="dpmsolver")
    assert np.isfinite(dmel16).all() and (dlen16 == dlen32).all()
    dcorr = np.corrcoef(dmel32.ravel(), dmel16.ravel())[0, 1]
    assert dcorr > 0.9, dcorr
    assert abs(dmel16.std() - dmel32.std()) < 0.05 * max(dmel32.std(), 1e-3)
