"""Checkpoint save/load + rotation + hparams utilities."""
import os

import numpy as np

from diff_vits_tpu.train import checkpoint as ck
from diff_vits_tpu.utils.hparams import HParams, load_params_tolerant, merge_params


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    d = str(tmp_path)
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "opt_state": {"mu": np.zeros(3, np.float32)}}
    for step in (10, 20, 30, 40):
        ck.save_checkpoint(d, step, state, keep=2)
    files = sorted(os.listdir(d))
    assert files == ["model-30.ckpt", "model-40.ckpt"]
    assert ck.latest_checkpoint_path(d).endswith("model-40.ckpt")

    step, loaded = ck.load_checkpoint(ck.latest_checkpoint_path(d))
    assert step == 40
    np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])


def test_hparams():
    h = HParams(train={"lr": 1e-4, "betas": [0.9, 0.99]}, name="x")
    assert h.train.lr == 1e-4
    assert "name" in h
    assert h["name"] == "x"


def test_merge_and_tolerant_load():
    a = {"layer": {"w": np.ones((2, 2), np.float32)}}
    b = {"layer": {"w": np.zeros((2, 2), np.float32)}}
    merged = merge_params([a, b], [0.25, 0.75])
    np.testing.assert_allclose(merged["layer"]["w"], 0.25)

    target = {"layer": {"w": np.zeros((2, 2), np.float32),
                        "b": np.zeros(2, np.float32)}}
    saved = {"layer": {"w": np.ones((3, 3), np.float32)}}  # shape mismatch
    out = load_params_tolerant(target, saved)
    np.testing.assert_array_equal(out["layer"]["w"], target["layer"]["w"])
    assert "b" in out["layer"]
