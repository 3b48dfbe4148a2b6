"""Reference-checkpoint conversion CLI: .pt -> our .ckpt round trip."""
import os
import sys

import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

from tests import ref_stubs  # noqa: E402

ref_stubs.install()

import torch  # noqa: E402

from diff_vits_tpu.core.config import (  # noqa: E402
    Config, DataConfig, DiffusionEncoderConfig, TrainConfig, VitsConfig)
from diff_vits_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from diff_vits_tpu.utils import convert  # noqa: E402
from diff_vits_tpu.utils.transplant import (  # noqa: E402
    diff_vits_params_from_config)

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow


def test_convert_cli_round_trip(tmp_path, monkeypatch):
    import json

    import model3

    ref_cfg = {
        "data": {"window_size": 1024},
        "train": {"timesteps": 1000},
        "vits": {
            "inter_channels": 128, "hidden_channels": 256,
            "filter_channels": 64, "n_heads": 2, "n_layers": 3,
            "kernel_size": 3, "p_dropout": 0.0, "gin_channels": 32,
        },
        "diffusion_encoder": {
            "in_channels": 100, "out_channels": 100,
            "hidden_channels": 128, "n_heads": 8, "p_dropout": 0.0,
        },
    }
    ref = model3.NaturalSpeech2(ref_cfg).eval()
    # the reference saves with accelerate's unwrapped state_dict; also
    # exercise the DDP-prefix tolerance
    state = {f"module.{k}": v for k, v in ref.state_dict().items()}
    pt_path = tmp_path / "model-123.pt"
    torch.save({"step": 123, "model": state}, pt_path)

    cfg = Config(
        train=TrainConfig(timesteps=1000),
        data=DataConfig(),
        vits=VitsConfig(inter_channels=128, hidden_channels=256,
                        filter_channels=64, n_heads=2, n_layers=3,
                        posterior_n_layers=16, gin_channels=32),
        diffusion_encoder=DiffusionEncoderConfig(),
    )
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({
        "train": {"timesteps": 1000},
        "vits": {"inter_channels": 128, "hidden_channels": 256,
                 "filter_channels": 64, "n_heads": 2, "n_layers": 3,
                 "gin_channels": 32},
    }))

    out_dir = tmp_path / "converted"
    monkeypatch.setattr(sys, "argv", [
        "convert", "--ref_ckpt", str(pt_path), "-c", str(cfg_path),
        "--out_dir", str(out_dir)])
    convert.main()

    ckpt = out_dir / "model-123.ckpt"
    assert ckpt.exists()
    step, saved = ckpt_lib.load_checkpoint(str(ckpt))
    assert step == 123

    direct = diff_vits_params_from_config(
        {k: v for k, v in ref.state_dict().items()}, cfg)
    flat_saved = jax_flat(saved["params"])
    flat_direct = jax_flat(direct)
    assert set(flat_saved) == set(flat_direct)
    for k in flat_direct:
        np.testing.assert_array_equal(np.asarray(flat_saved[k]),
                                      np.asarray(flat_direct[k]), err_msg=k)


def jax_flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flat(v, f"{prefix}/{k}"))
        return out
    out[prefix] = tree
    return out
