"""Logging / TensorBoard helpers.

Parity: utils.py:312-383,467-479 (get_logger, summarize, matplotlib
spectrogram/alignment renderers). TensorBoard via tensorboardX.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    logger = logging.getLogger(os.path.basename(model_dir))
    logger.setLevel(logging.DEBUG)
    formatter = logging.Formatter(
        "%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s")
    os.makedirs(model_dir, exist_ok=True)
    h = logging.FileHandler(os.path.join(model_dir, filename))
    h.setLevel(logging.DEBUG)
    h.setFormatter(formatter)
    logger.addHandler(h)
    return logger


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """mel [C, T] -> HWC uint8 image (utils.py:331-350)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(np.asarray(spectrogram), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    data = data.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3]
    plt.close(fig)
    return data


def plot_alignment_to_numpy(alignment: np.ndarray) -> np.ndarray:
    """attention [Tx, Ty] -> HWC uint8 image (utils.py:353-383)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(alignment), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Decoder timestep")
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    data = data.reshape(fig.canvas.get_width_height()[::-1] + (4,))[..., :3]
    plt.close(fig)
    return data


def summarize(writer, global_step: int,
              scalars: Optional[Dict[str, float]] = None,
              histograms: Optional[Dict] = None,
              images: Optional[Dict[str, np.ndarray]] = None,
              audios: Optional[Dict[str, np.ndarray]] = None,
              audio_sampling_rate: int = 24000):
    """TB writer helper (utils.py:312-320 semantics)."""
    for k, v in (scalars or {}).items():
        writer.add_scalar(k, float(v), global_step)
    for k, v in (histograms or {}).items():
        writer.add_histogram(k, np.asarray(v), global_step)
    for k, v in (images or {}).items():
        writer.add_image(k, v, global_step, dataformats="HWC")
    for k, v in (audios or {}).items():
        writer.add_audio(k, np.asarray(v), global_step, audio_sampling_rate)
