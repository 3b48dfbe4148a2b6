"""The shipped example configs must stay loadable and self-consistent."""
import glob
import os

from diff_vits_tpu.core.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_example_configs_load():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
    assert len(paths) >= 3  # parity, single-chip, multi-chip
    for p in paths:
        cfg = load_config(p)
        assert cfg.train.train_batch_size >= 1
        assert cfg.train.gradient_accumulate_every >= 1
        # batch must divide the data mesh axis the config asks for
        n_data = cfg.train.mesh_shape[cfg.train.mesh_axes.index("data")] \
            if "data" in cfg.train.mesh_axes else 1
        assert cfg.train.train_batch_size % max(1, n_data) == 0, p


def test_reference_parity_config_matches_upstream_values():
    cfg = load_config(os.path.join(CONFIG_DIR, "reference_parity.json"))
    # spot-check the hyperparameters against /root/reference/config.json
    assert cfg.train.train_batch_size == 32
    assert cfg.train.train_lr == 1e-4
    assert cfg.train.adam_betas == (0.9, 0.99)
    assert cfg.train.timesteps == 1000
    assert cfg.data.sampling_rate == 24000
    assert cfg.data.n_mel_channels == 100
    assert cfg.data.max_text_len == 300
    assert cfg.vits.hidden_channels == 256
    assert cfg.diffusion_encoder.hidden_channels == 128
