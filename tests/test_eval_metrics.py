"""Objective eval metrics (VERDICT r4 #7): every eval_sample logs mel L1 +
correlation vs the utterance's ground truth and a deterministic fixed-t
eval diffusion loss, making convergence machine-checkable (the reference
logs only images + a single uniformly-drawn-t loss, model3.py:1417-1447)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds a Trainer + sampler compile


def test_eval_sample_emits_objective_metrics(tmp_path, capsys):
    from tests.test_preemption import _tiny_cfg
    from diff_vits_tpu.train.trainer import Trainer

    data = str(tmp_path / "data")
    os.makedirs(data)
    cfg = _tiny_cfg(data)
    trainer = Trainer(cfg, workdir=str(tmp_path / "run"))

    trainer.eval_sample(10, writer=None, sampling_steps=3)
    m = trainer.last_eval_metrics
    for k in ("eval/mel_l1", "eval/mel_corr", "eval/diff_fixed_t"):
        assert k in m and np.isfinite(m[k]), (k, m)
    assert m["eval/mel_l1"] > 0.0
    assert -1.0 <= m["eval/mel_corr"] <= 1.0
    # per-t grid values are present and positive
    t_keys = [k for k in m if k.startswith("eval/diff_t")]
    assert len(t_keys) == 5
    assert all(m[k] > 0 for k in t_keys)
    # the metric line reaches stdout (convergence runs grep for it)
    assert "mel_l1=" in capsys.readouterr().out

    # fixed {t, noise} makes the eval loss deterministic across calls —
    # unlike the training loss, whose uniformly-drawn t makes adjacent
    # logged values bounce by orders of magnitude
    m2 = trainer.eval_fixed_t_loss(trainer._eval_batch())
    for k in t_keys:
        assert m2[k] == pytest.approx(m[k], rel=1e-6)
