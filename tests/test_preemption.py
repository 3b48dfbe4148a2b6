"""Preemption handling: SIGTERM mid-training -> checkpoint + clean exit +
auto-resume (SURVEY.md §5.3 — the reference has no failure handling)."""
import dataclasses
import os
import signal
import threading
import time

import numpy as np
import pytest

from diff_vits_tpu.core.config import (Config, DataConfig,
                                       DiffusionEncoderConfig, TrainConfig,
                                       VitsConfig)

pytestmark = pytest.mark.slow  # builds a Trainer: big XLA CPU compile


def _tiny_cfg(tmp, n_utts=16):
    from diff_vits_tpu.text.symbols import symbols

    rng = np.random.default_rng(0)
    for i in range(n_utts):
        t = int(rng.integers(16, 24))
        np.save(os.path.join(tmp, f"u{i}.mel.npy"),
                rng.normal(size=(t, 8)).astype(np.float32))
        n_ph = 6
        phones = " ".join(symbols[int(j)] for j in rng.integers(1, 40, n_ph))
        with open(os.path.join(tmp, f"u{i}.txt"), "w") as f:
            f.write(f"EN|x|{phones}|{' '.join('0' * n_ph).strip()}"
                    f"|{' '.join('1' * n_ph).strip()}\n")
        with open(os.path.join(tmp, f"u{i}.wav"), "wb") as f:
            f.write(b"RIFF\x24\x00\x00\x00WAVEfmt ")
    return Config(
        # batch 8: the conftest backend exposes 8 virtual devices and the
        # global batch must shard over the 'data' axis
        train=TrainConfig(train_batch_size=8, timesteps=100,
                          compute_dtype="float32", num_workers=0,
                          save_and_sample_every=10_000,
                          use_native_loader=False),
        data=DataConfig(n_mel_channels=8, max_text_len=16, max_mel_len=16,
                        min_mel_len=8, training_files=tmp, val_files=tmp),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=2,
                        posterior_in_channels=8, posterior_n_layers=2),
    )


def test_sigterm_checkpoints_and_resumes(tmp_path):
    import jax.numpy as jnp

    from diff_vits_tpu.train import checkpoint as ckpt_lib
    from diff_vits_tpu.train.trainer import Trainer

    data = str(tmp_path / "data")
    os.makedirs(data)
    cfg = _tiny_cfg(data)
    workdir = str(tmp_path / "run")
    trainer = Trainer(cfg, workdir=workdir)

    # the signal/checkpoint/resume wiring is under test, not XLA: swap the
    # jitted step for a fast fake (the real step is covered by
    # test_dropout_rng/test_model_smoke; its compile takes minutes on the
    # CPU backend, which would let the tool-level timeout's SIGTERM race
    # the test's own)
    metrics0 = {"loss/all": jnp.asarray(1.0)}
    started = threading.Event()

    def fake_step(state, batch):
        started.set()
        time.sleep(0.01)
        return ({**state, "step": state["step"] + 1}, dict(metrics0))

    trainer.train_step = fake_step

    # deliver SIGTERM mid-loop — armed only once the first step has run,
    # i.e. after train() installed its handler (a SIGTERM before that
    # hits the default action and kills the test runner); the loop must
    # finish the in-flight step, write a checkpoint, and return
    def kill_when_started():
        assert started.wait(timeout=120)
        time.sleep(0.3)
        os.kill(os.getpid(), signal.SIGTERM)

    killer = threading.Thread(target=kill_when_started, daemon=True)
    killer.start()
    trainer.train(num_steps=10_000, log_every=1000)

    path = ckpt_lib.latest_checkpoint_path(workdir)
    assert path, "no checkpoint written on preemption"
    step_saved, _ = ckpt_lib.load_checkpoint(path)
    assert 1 <= step_saved < 10_000

    # the handler must be restored after train() returns
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # auto-resume continues from the preemption checkpoint
    assert trainer.resume_latest()
    assert int(trainer.state["step"]) == step_saved
    trainer.train(num_steps=step_saved + 2, log_every=1)
    assert int(trainer.state["step"]) == step_saved + 2
