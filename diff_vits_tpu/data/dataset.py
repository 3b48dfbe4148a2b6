"""Training dataset: cleaned-text + mel loading, prompt splitting, batching.

Capability parity with ``TextAudioDataset_split`` / ``TextAudioCollate_split``
(dataset.py:145-287) redesigned for TPU input pipelines:

* features are .npy sidecar files written by our preprocess CLI (the
  reference uses torch.save .mel.pt, dataset.py:163);
* ``random_slice`` reproduces the reference augmentation exactly
  (dataset.py:196-214): crop to <=400 frames, prompt span l ~ U[len/3, 2len/3]
  at offset u, refer1 = mel[u:v], refer2 = complement;
* batches are padded to *static* bucket shapes so XLA compiles once per
  bucket (the reference pads dynamically per batch, an anti-pattern on TPU);
* per-host sharding is deterministic by index (fixing the reference's broken
  rank sharding, model3.py:1307-1309 — SURVEY.md §7.4).
"""
from __future__ import annotations

import dataclasses
import glob
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from diff_vits_tpu.core.config import Config
from diff_vits_tpu.core.masking import intersperse
from diff_vits_tpu.data import audio as audio_lib
from diff_vits_tpu.text.frontend import cleaned_text_to_sequence


@dataclasses.dataclass
class Example:
    phones: np.ndarray      # [Tx] int32
    tones: np.ndarray       # [Tx] int32
    languages: np.ndarray   # [Tx] int32
    mel: np.ndarray         # [Ty, 100] float32
    wav: Optional[np.ndarray] = None


def parse_cleaned_line(line: str, add_blank: bool = True):
    """'lang|norm|phones|tones|word2ph' -> (phones, tones, languages) int32.

    Parity: dataset.py:166-191 (get_text + get_audio_text_pair).
    """
    language, _text, phones_s, tones_s, _word2ph = line.strip().split("|")
    phones = phones_s.split(" ")
    tones = [int(i) for i in tones_s.split(" ")]
    phone, tone, lang = cleaned_text_to_sequence(phones, tones, language)
    if add_blank:
        phone = intersperse(phone, 0)
        tone = intersperse(tone, 0)
        lang = intersperse(lang, 0)
    return (np.asarray(phone, np.int32), np.asarray(tone, np.int32),
            np.asarray(lang, np.int32))


class TextMelDataset:
    """Loads (cleaned text, mel) pairs from a processed directory."""

    def __init__(self, cfg: Config, root: Optional[str] = None):
        self.cfg = cfg
        root = root or cfg.data.training_files
        self.audiopaths = sorted(
            glob.glob(os.path.join(root, "**", "*.wav"), recursive=True))
        self.hop_length = cfg.data.hop_length
        self.add_blank = cfg.data.add_blank

    def __len__(self):
        return len(self.audiopaths)

    def load(self, index: int) -> Optional[Example]:
        path = self.audiopaths[index]
        txt_path = path[:-4] + ".txt"
        mel_path = path[:-4] + ".mel.npy"
        try:
            with open(txt_path, encoding="utf-8") as f:
                phones, tones, langs = parse_cleaned_line(
                    f.readline(), self.add_blank)
            if os.path.exists(mel_path):
                mel = np.load(mel_path)
            elif os.path.exists(path[:-4] + ".mel.pt"):
                # datasets preprocessed by the reference repo: torch-saved
                # [1, 100, T] log-mel (preprocess.py:44-55) -> [T, 100]
                import torch
                t = torch.load(path[:-4] + ".mel.pt", map_location="cpu",
                               weights_only=True)
                mel = np.ascontiguousarray(
                    t.numpy().reshape(-1, t.shape[-1]).T)
            else:
                wav, sr = audio_lib.read_wav(path)
                wav = audio_lib.resample(wav, sr, self.cfg.data.sampling_rate)
                mel = audio_lib.log_mel(wav, sr=self.cfg.data.sampling_rate,
                                        hop_length=self.hop_length,
                                        n_mels=self.cfg.data.n_mel_channels)
        except (OSError, ValueError):
            return None
        # `phones` is already blank-interspersed (length 2n+1); compare
        # against the interspersed cap so the filter matches the collate
        # buffer and the native loader (dataset.py:56 of the reference
        # filters raw text before interspersing)
        max_len = self.cfg.data.max_text_len * 2 + 1 if self.add_blank \
            else self.cfg.data.max_text_len
        if not (self.cfg.data.min_text_len <= len(phones) <= max_len):
            return None
        return Example(phones, tones, langs, mel.astype(np.float32))


def random_slice(mel: np.ndarray, rng: random.Random,
                 max_frames: int = 400, min_frames: int = 30):
    """Crop + prompt-span split. Parity: dataset.py:196-214.

    Returns (spec, refer1, refer2) or None if too short.
    """
    if mel.shape[0] < min_frames:
        return None
    if mel.shape[0] > max_frames:
        start = rng.randint(0, mel.shape[0] - max_frames)
        mel = mel[start:start + max_frames]
    len_mel = mel.shape[0]
    l = rng.randint(len_mel // 3, len_mel // 3 * 2)
    u = rng.randint(0, len_mel - l)
    v = u + l
    refer1 = mel[u:v]
    refer2 = np.concatenate([mel[:u], mel[v:]], axis=0)
    return mel, refer1, refer2


def pad_to(x: np.ndarray, length: int, axis: int = 0) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, max(0, length - x.shape[axis]))
    out = np.pad(x, pad)
    slc = [slice(None)] * x.ndim
    slc[axis] = slice(0, length)
    return out[tuple(slc)]


@dataclasses.dataclass
class Batch:
    """Static-shape training batch (channel-last)."""
    text: np.ndarray            # [B, Tx] int32
    tone: np.ndarray            # [B, Tx]
    language: np.ndarray        # [B, Tx]
    spec: np.ndarray            # [B, Ty, C]
    refer1: np.ndarray          # [B, S1, C]
    refer2: np.ndarray          # [B, S2, C]
    text_lengths: np.ndarray    # [B]
    spec_lengths: np.ndarray    # [B]
    refer1_lengths: np.ndarray  # [B]
    refer2_lengths: np.ndarray  # [B]


class TrainLoader:
    """Shuffled, per-host-sharded, static-shape batch iterator.

    Each host takes examples where ``index % num_hosts == host_id`` — a
    deterministic disjoint shard (the reference's Accelerate sharding is
    accidentally disabled, model3.py:1307-1309).
    """

    def __init__(self, dataset: TextMelDataset, cfg: Config,
                 batch_size: Optional[int] = None, seed: int = 0,
                 host_id: int = 0, num_hosts: int = 1):
        self.ds = dataset
        self.cfg = cfg
        self.batch_size = batch_size or cfg.train.train_batch_size
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.max_text = cfg.data.max_text_len * 2 + 1 if cfg.data.add_blank \
            else cfg.data.max_text_len
        self.max_mel = cfg.data.max_mel_len

    def __iter__(self) -> Iterator[Batch]:
        epoch = 0
        while True:
            rng = random.Random(self.seed * 1_000_003 + epoch)
            order = list(range(len(self.ds)))
            rng.shuffle(order)
            order = order[self.host_id::self.num_hosts]
            buf: List = []
            n_yielded = 0
            for idx in order:
                ex = self.ds.load(idx)
                if ex is None:
                    continue
                sliced = random_slice(ex.mel, rng,
                                      max_frames=self.cfg.data.max_mel_len,
                                      min_frames=self.cfg.data.min_mel_len)
                if sliced is None:
                    continue
                buf.append((ex, sliced))
                if len(buf) == self.batch_size:
                    yield self._collate(buf)
                    buf = []
                    n_yielded += 1
            if n_yielded == 0:
                # every utterance filtered (too short / unreadable): spin
                # forever silently otherwise
                raise ValueError(
                    f"epoch {epoch} produced no batches: "
                    f"{len(order)} candidate utterances on host "
                    f"{self.host_id}/{self.num_hosts}, all filtered "
                    f"(< data.min_mel_len={self.cfg.data.min_mel_len} "
                    f"frames or unreadable), or fewer than batch_size="
                    f"{self.batch_size} survived")
            epoch += 1

    def _collate(self, items) -> Batch:
        t_x = self.max_text
        t_y = self.max_mel
        # prompt spans are <= 2/3 of max_mel frames (+1 like the reference's
        # max_len+1 padding, dataset.py:250-253)
        s_max = self.max_mel * 2 // 3 + 1
        b = len(items)
        c = items[0][0].mel.shape[-1]
        batch = Batch(
            text=np.zeros((b, t_x), np.int32),
            tone=np.zeros((b, t_x), np.int32),
            language=np.zeros((b, t_x), np.int32),
            spec=np.zeros((b, t_y, c), np.float32),
            refer1=np.zeros((b, s_max, c), np.float32),
            refer2=np.zeros((b, s_max, c), np.float32),
            text_lengths=np.zeros(b, np.int32),
            spec_lengths=np.zeros(b, np.int32),
            refer1_lengths=np.zeros(b, np.int32),
            refer2_lengths=np.zeros(b, np.int32),
        )
        for i, (ex, (spec, r1, r2)) in enumerate(items):
            n_t = min(len(ex.phones), t_x)
            batch.text[i, :n_t] = ex.phones[:n_t]
            batch.tone[i, :n_t] = ex.tones[:n_t]
            batch.language[i, :n_t] = ex.languages[:n_t]
            batch.text_lengths[i] = n_t
            n_y = min(spec.shape[0], t_y)
            batch.spec[i, :n_y] = spec[:n_y]
            batch.spec_lengths[i] = n_y
            n1 = min(r1.shape[0], s_max)
            batch.refer1[i, :n1] = r1[:n1]
            batch.refer1_lengths[i] = n1
            n2 = min(r2.shape[0], s_max)
            batch.refer2[i, :n2] = r2[:n2]
            batch.refer2_lengths[i] = n2
        return batch


class TextAudioLegacyDataset(TextMelDataset):
    """Legacy non-split dataset: (phones, spec, mel, wav, tone, language).

    Parity: dataset.py:15-75 (``TextAudioDataset``) — loads both the linear
    .spec and mel features, no prompt splitting. Kept for the model/model2
    variants that consume 513-ch linear spectrograms (model.py:564).
    """

    def load(self, index: int):
        ex = super().load(index)
        if ex is None:
            return None
        path = self.audiopaths[index]
        spec_path = path[:-4] + ".spec.npy"
        spec = np.load(spec_path) if os.path.exists(spec_path) else None
        wav, sr = audio_lib.read_wav(path)
        wav = audio_lib.resample(wav, sr, self.cfg.data.sampling_rate)
        return ex, spec, wav
