"""Native (C++/OpenMP) batch loader — drop-in for ``TrainLoader``.

The reference reaches native code for data loading through torch's C++
DataLoader with 32 worker processes (model3.py:1304-1309). Here the hot
per-step path — .npy mel read, random crop, prompt-span split, zero-pad
collate (dataset.py:196-287) — runs in one C++ call (csrc/loader.cc,
OpenMP over batch items) through ctypes; Python keeps only the cheap parts
(epoch shuffling, host sharding, cached text-id arrays).

Falls back to the pure-Python ``TrainLoader`` if the toolchain is missing
(``native_available()``).
"""
from __future__ import annotations

import ctypes
import os
import random
import subprocess
import threading
from typing import Iterator, List, Optional

import numpy as np

from diff_vits_tpu.core.config import Config
from diff_vits_tpu.data.dataset import (Batch, TextMelDataset,
                                        parse_cleaned_line)

_lock = threading.Lock()
_lib = None

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so_path = os.path.join(_CSRC, "libloader.so")
        src = os.path.join(_CSRC, "loader.cc")
        if not os.path.exists(so_path) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(so_path)):
            subprocess.run(["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                            "-o", so_path, src],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.dvt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            f32p, i32p, f32p, i32p, f32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dvt_load_batch.restype = ctypes.c_int
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


class NativeTrainLoader:
    """Shuffled, per-host-sharded, static-shape batch iterator (C++ hot path).

    Same iteration semantics as ``TrainLoader`` (epoch reshuffle, disjoint
    host shards, static [B, T, C] buffers); the RNG stream for crops/prompt
    spans is the native splitmix64 stream, deterministic per
    (seed, epoch, item)."""

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
        self.s_max = self.max_mel * 2 // 3 + 1
        self.lib = _build_and_load()

        # parse text sidecars once; drop items without a mel sidecar
        self.mel_paths: List[bytes] = []
        self.texts: List[np.ndarray] = []
        self.tones: List[np.ndarray] = []
        self.langs: List[np.ndarray] = []
        for path in dataset.audiopaths:
            txt_path = path[:-4] + ".txt"
            mel_path = path[:-4] + ".mel.npy"
            if not (os.path.exists(txt_path) and os.path.exists(mel_path)):
                continue
            try:
                with open(txt_path, encoding="utf-8") as f:
                    ph, tn, lg = parse_cleaned_line(f.readline(),
                                                    cfg.data.add_blank)
            except (OSError, ValueError):
                continue
            if not (cfg.data.min_text_len <= len(ph) <= self.max_text):
                continue
            self.mel_paths.append(mel_path.encode())
            self.texts.append(ph)
            self.tones.append(tn)
            self.langs.append(lg)

    def __len__(self):
        return len(self.mel_paths)

    def _load_native(self, idxs: List[int], seed: int):
        n = len(idxs)
        c = self.cfg.data.n_mel_channels
        spec = np.empty((n, self.max_mel, c), np.float32)
        r1 = np.empty((n, self.s_max, c), np.float32)
        r2 = np.empty((n, self.s_max, c), np.float32)
        sl = np.empty(n, np.int32)
        l1 = np.empty(n, np.int32)
        l2 = np.empty(n, np.int32)
        paths = (ctypes.c_char_p * n)(*[self.mel_paths[i] for i in idxs])
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self.lib.dvt_load_batch(
            paths, n, self.cfg.data.min_mel_len, self.max_mel,
            np.uint64(seed & (2**64 - 1)),
            spec.ctypes.data_as(f32p), sl.ctypes.data_as(i32p),
            r1.ctypes.data_as(f32p), l1.ctypes.data_as(i32p),
            r2.ctypes.data_as(f32p), l2.ctypes.data_as(i32p),
            self.max_mel, self.s_max, c)
        return spec, sl, r1, l1, r2, l2

    def __iter__(self) -> Iterator[Batch]:
        epoch = 0
        b = self.batch_size
        while True:
            rng = random.Random(self.seed * 1_000_003 + epoch)
            order = list(range(len(self.mel_paths)))
            rng.shuffle(order)
            order = order[self.host_id::self.num_hosts]
            pos = 0
            pending: List[int] = []
            while True:
                while len(pending) < b and pos < len(order):
                    pending.append(order[pos])
                    pos += 1
                if len(pending) < b:
                    break  # epoch exhausted
                seed = (self.seed << 20) ^ (epoch << 8) ^ pos
                spec, sl, r1, l1, r2, l2 = self._load_native(pending, seed)
                keep = np.nonzero(sl > 0)[0]
                batch_idx = [pending[k] for k in keep[:b]]
                if len(batch_idx) < b:
                    pending = [pending[k] for k in keep]  # refill and retry
                    if pos >= len(order):
                        break
                    continue
                yield self._assemble(batch_idx, spec[keep[:b]], sl[keep[:b]],
                                     r1[keep[:b]], l1[keep[:b]],
                                     r2[keep[:b]], l2[keep[:b]])
                pending = []
            epoch += 1

    def _assemble(self, idxs, spec, sl, r1, l1, r2, l2) -> Batch:
        n = len(idxs)
        text = np.zeros((n, self.max_text), np.int32)
        tone = np.zeros((n, self.max_text), np.int32)
        lang = np.zeros((n, self.max_text), np.int32)
        tlen = np.zeros(n, np.int32)
        for j, i in enumerate(idxs):
            t = min(len(self.texts[i]), self.max_text)
            text[j, :t] = self.texts[i][:t]
            tone[j, :t] = self.tones[i][:t]
            lang[j, :t] = self.langs[i][:t]
            tlen[j] = t
        return Batch(text=text, tone=tone, language=lang,
                     spec=np.ascontiguousarray(spec),
                     refer1=np.ascontiguousarray(r1),
                     refer2=np.ascontiguousarray(r2),
                     text_lengths=tlen, spec_lengths=sl.astype(np.int32),
                     refer1_lengths=l1.astype(np.int32),
                     refer2_lengths=l2.astype(np.int32))
