"""Native C++/OpenMP batch loader vs the pure-Python TrainLoader."""
import os

import numpy as np
import pytest

from diff_vits_tpu.core.config import Config, DataConfig, TrainConfig
from diff_vits_tpu.data.dataset import TextMelDataset

try:
    from diff_vits_tpu.data.native_loader import (NativeTrainLoader,
                                                  native_available)
    HAVE_NATIVE = native_available()
except Exception:  # toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="g++ toolchain unavailable")


def _make_corpus(tmp_path, n=6, c=8, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        frames = int(rng.integers(40, 300))
        mel = rng.normal(size=(frames, c)).astype(np.float32)
        base = tmp_path / f"utt{i}"
        np.save(str(base) + ".mel.npy", mel)
        (tmp_path / f"utt{i}.wav").write_bytes(b"RIFF")
        (tmp_path / f"utt{i}.txt").write_text(
            "EN|hi.|_ hh ay . _|0 0 1 0 0|1 2 1 1\n")
    return str(tmp_path)


def _cfg(root):
    return Config(train=TrainConfig(train_batch_size=3),
                  data=DataConfig(training_files=root, n_mel_channels=8,
                                  max_mel_len=100, min_mel_len=30))


def test_native_loader_batches(tmp_path):
    root = _make_corpus(tmp_path)
    cfg = _cfg(root)
    ds = TextMelDataset(cfg, root)
    loader = NativeTrainLoader(ds, cfg, seed=3)
    assert len(loader) == 6
    it = iter(loader)
    for _ in range(4):  # crosses epoch boundary (6 items / batch 3)
        b = next(it)
        assert b.spec.shape == (3, 100, 8)
        assert b.refer1.shape == b.refer2.shape == (3, 100 * 2 // 3 + 1, 8)
        assert (b.spec_lengths >= 30).all() and (b.spec_lengths <= 100).all()
        assert (b.refer1_lengths > 0).all() and (b.refer2_lengths > 0).all()
        # refer1 + refer2 partition the cropped spec
        np.testing.assert_array_equal(
            b.refer1_lengths + b.refer2_lengths, b.spec_lengths)
        assert (b.text_lengths == 11).all()  # 5 phones * 2 + 1 blanks
        # padding is zero beyond lengths
        for j in range(3):
            assert not b.spec[j, b.spec_lengths[j]:].any()
            assert not b.refer1[j, b.refer1_lengths[j]:].any()


def test_native_loader_deterministic(tmp_path):
    root = _make_corpus(tmp_path)
    cfg = _cfg(root)
    ds = TextMelDataset(cfg, root)
    a = next(iter(NativeTrainLoader(ds, cfg, seed=5)))
    b = next(iter(NativeTrainLoader(ds, cfg, seed=5)))
    np.testing.assert_array_equal(a.spec, b.spec)
    np.testing.assert_array_equal(a.refer1, b.refer1)
    c = next(iter(NativeTrainLoader(ds, cfg, seed=6)))
    assert not np.array_equal(a.spec, c.spec)


def test_native_slice_content_matches_file(tmp_path):
    """refer1 must be a contiguous span of the cropped spec."""
    root = _make_corpus(tmp_path, n=3)
    cfg = _cfg(root)
    ds = TextMelDataset(cfg, root)
    b = next(iter(NativeTrainLoader(ds, cfg, batch_size=3, seed=1)))
    for j in range(3):
        sl, l1 = int(b.spec_lengths[j]), int(b.refer1_lengths[j])
        spec = b.spec[j, :sl]
        r1 = b.refer1[j, :l1]
        # find r1's first row inside spec
        hits = np.where((spec == r1[0]).all(axis=1))[0]
        assert len(hits) >= 1
        u = int(hits[0])
        np.testing.assert_array_equal(spec[u:u + l1], r1)
