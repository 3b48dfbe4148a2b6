"""HParams attr-dict + checkpoint merge/compat helpers.

Parity: utils.py:397-444 (``HParams``), utils.py:499-510 (``mix_model``),
utils.py:247-277 (shape-tolerant checkpoint loading).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


class HParams:
    """Attribute-dict over nested config dicts (utils.py:397)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            if isinstance(v, dict):
                v = HParams(**v)
            self[k] = v

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def values(self):
        return self.__dict__.values()

    def __len__(self):
        return len(self.__dict__)

    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        return setattr(self, key, value)

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        return repr(self.__dict__)


def _flatten(tree: Dict[str, Any], prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def merge_params(trees, weights=None) -> Dict[str, Any]:
    """Weighted average of parameter trees (utils.py:499 ``mix_model``)."""
    flats = [_flatten(t) for t in trees]
    weights = weights or [1.0 / len(trees)] * len(trees)
    out = {}
    for k in flats[0]:
        out[k] = sum(w * np.asarray(f[k], np.float32)
                     for w, f in zip(weights, flats))
    return _unflatten(out)


def load_params_tolerant(target: Dict[str, Any],
                         saved: Dict[str, Any]) -> Dict[str, Any]:
    """Load params keeping target values where shapes mismatch or keys are
    missing (utils.py:247-277 semantics)."""
    t_flat = _flatten(target)
    s_flat = _flatten(saved)
    out = {}
    for k, v in t_flat.items():
        sv = s_flat.get(k)
        if sv is not None and np.shape(sv) == np.shape(v):
            out[k] = np.asarray(sv)
        else:
            out[k] = v
    return _unflatten(out)
