"""Content-feature helpers (sovits-era capability, SURVEY.md §2.8).

Parity targets in the reference's utils.py: ``repeat_expand_2d`` (:482,
nearest-position expansion of [C, T] features to a target length) and the
HuBERT content loaders (:209-243). The reference's loaders need fairseq +
a local checkpoint; here content extraction is a pluggable callable and the
expansion is a vectorized gather (jit-safe, no per-frame Python loop).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def repeat_expand_2d(content: np.ndarray, target_len: int) -> np.ndarray:
    """Expand [C, T_src] -> [C, target_len], each output frame copying the
    source frame whose span covers it (utils.py:482-496 semantics)."""
    src_len = content.shape[-1]
    # boundaries temp[p] = p * target/src; frame i copies source
    # max{p : temp[p] <= i} (the reference walks these cumulatively)
    bounds = np.arange(1, src_len + 1) * target_len / src_len
    pos = np.searchsorted(bounds, np.arange(target_len), side="right")
    pos = np.minimum(pos, src_len - 1)
    return np.ascontiguousarray(content[:, pos])


class ContentExtractor:
    """Pluggable wav -> content-feature extractor.

    The reference hard-codes a fairseq HuBERT checkpoint
    (utils.py:209-229). That stack is optional here: pass any callable
    ``fn(wav_16k [T]) -> [C, T']`` (e.g. a transformers HubertModel wrapper)
    or rely on :meth:`from_transformers` when the weights are available.
    """

    def __init__(self, fn: Optional[Callable[[np.ndarray], np.ndarray]] = None):
        self._fn = fn

    @classmethod
    def from_transformers(cls, name_or_path: str, layer: int = 12):
        """HuBERT content via HF transformers (capability parity with
        get_hubert_content's layer-12 features, utils.py:222-235)."""
        import torch
        from transformers import HubertModel

        model = HubertModel.from_pretrained(name_or_path).eval()

        def fn(wav_16k: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                out = model(torch.tensor(wav_16k, dtype=torch.float32)[None],
                            output_hidden_states=True)
            return out.hidden_states[layer][0].numpy().T

        return cls(fn)

    def __call__(self, wav_16k: np.ndarray) -> np.ndarray:
        if self._fn is None:
            raise RuntimeError(
                "no content model configured; construct with a callable or "
                "ContentExtractor.from_transformers(<hubert checkpoint>)")
        return self._fn(np.asarray(wav_16k, np.float32))
