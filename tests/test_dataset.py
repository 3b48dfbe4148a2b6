"""Data pipeline: TrainLoader iteration, sharding, random_slice.

Covers the host input pipeline end-to-end (the dataset the training CLI
drives): cleaned-line parsing, epoch shuffling, per-host sharding, and the
static-shape collate. Parity surface: dataset.py:145-287 of the reference.
"""
import numpy as np
import pytest

from diff_vits_tpu.core.config import Config, DataConfig, TrainConfig
from diff_vits_tpu.data.dataset import (
    Example, TextMelDataset, TrainLoader, parse_cleaned_line, random_slice)


class FakeDataset(TextMelDataset):
    """In-memory dataset (no files)."""

    def __init__(self, cfg, n=8, seed=0):
        self.cfg = cfg
        self.hop_length = cfg.data.hop_length
        self.add_blank = cfg.data.add_blank
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            t_x = int(rng.integers(4, 12))
            t_y = int(rng.integers(60, 200))
            self.items.append(Example(
                phones=rng.integers(1, 50, t_x).astype(np.int32),
                tones=np.zeros(t_x, np.int32),
                languages=np.zeros(t_x, np.int32),
                mel=rng.normal(size=(t_y, cfg.data.n_mel_channels))
                .astype(np.float32)))
        self.audiopaths = [f"fake{i}.wav" for i in range(n)]

    def load(self, index):
        return self.items[index]


def _cfg(**data_kw):
    return Config(train=TrainConfig(train_batch_size=4),
                  data=DataConfig(n_mel_channels=8, max_mel_len=100,
                                  min_mel_len=30, **data_kw))


def test_train_loader_iterates_across_epochs():
    cfg = _cfg()
    ds = FakeDataset(cfg)
    it = iter(TrainLoader(ds, cfg, seed=3))
    # 8 examples / batch 4 = 2 batches per epoch; draw 5 => crosses epochs
    for _ in range(5):
        b = next(it)
        assert b.text.shape == (4, cfg.data.max_text_len * 2 + 1)
        assert b.spec.shape == (4, 100, 8)
        assert b.refer1.shape == b.refer2.shape == (4, 100 * 2 // 3 + 1, 8)
        assert (b.spec_lengths >= cfg.data.min_mel_len).all()
        assert (b.refer1_lengths > 0).all() and (b.refer2_lengths > 0).all()


def test_train_loader_host_sharding_disjoint():
    cfg = _cfg()
    ds = FakeDataset(cfg)

    def first_epoch_texts(host_id, num_hosts):
        loader = TrainLoader(ds, cfg, batch_size=1, seed=7,
                             host_id=host_id, num_hosts=num_hosts)
        out = []
        for i, b in enumerate(loader):
            if i >= len(ds) // num_hosts:
                break
            out.append(int(b.text_lengths[0]) * 1000 + int(b.text[0, 1]))
        return out

    a = first_epoch_texts(0, 2)
    b = first_epoch_texts(1, 2)
    assert len(a) == len(b) == 4


def test_random_slice_bounds():
    rng = __import__("random").Random(0)
    mel = np.random.default_rng(0).normal(size=(500, 8)).astype(np.float32)
    spec, r1, r2 = random_slice(mel, rng, max_frames=400, min_frames=30)
    assert spec.shape[0] <= 400
    l = spec.shape[0]
    assert l // 3 <= r1.shape[0] <= 2 * l // 3 + 1
    assert r1.shape[0] + r2.shape[0] == l
    # too-short input is rejected (dataset.py:197-199)
    assert random_slice(mel[:20], rng, max_frames=400, min_frames=30) is None


def test_parse_cleaned_line_roundtrip():
    line = "EN|hello.|_ hh ah l ow . _|0 0 1 0 2 0 0|1 2 3 1"
    phones, tones, langs = parse_cleaned_line(line, add_blank=True)
    assert len(phones) == len(tones) == len(langs) == 15  # 7*2+1 blanks
    assert phones[0] == 0 and phones[3] != 0  # blanks interleaved


def test_reference_mel_pt_fallback(tmp_path):
    """Datasets preprocessed by the reference repo (.mel.pt, [1,100,T])
    load without re-preprocessing."""
    import struct
    import wave

    import torch

    from diff_vits_tpu.data.dataset import TextMelDataset

    wav_path = tmp_path / "utt0.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(struct.pack("<h", 0) * 2400)
    (tmp_path / "utt0.txt").write_text("ZH|x|_ a _|0 1 0|1 1 1\n")
    mel = np.random.default_rng(0).normal(size=(1, 100, 37)).astype(
        np.float32)
    torch.save(torch.tensor(mel), str(tmp_path / "utt0.mel.pt"))

    ds = TextMelDataset(_cfg(), root=str(tmp_path))
    ex = ds.load(0)
    assert ex is not None
    assert ex.mel.shape == (37, 100)
    np.testing.assert_allclose(ex.mel, mel[0].T)
