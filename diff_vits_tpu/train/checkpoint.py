"""Checkpoint save/load with keep-N rotation.

Improves on the reference (model3.py:1326-1346 + utils.py:292-310): we save
params AND optimizer state AND step AND the PRNG key (the reference drops
optimizer state — SURVEY.md §7.4), with the same keep-newest-N rotation
semantics (regex over step numbers).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def gather_for_save(tree):
    """Materialize a (possibly sharded) state tree as host numpy arrays.

    Multi-host-safe: TP/FSDP-sharded leaves on a multi-host mesh are not
    fully addressable, so a bare ``device_get`` raises (the round-1
    checkpointing caveat, VERDICT.md weak #5). Such leaves are gathered
    with ``multihost_utils.process_allgather`` — a collective, so EVERY
    process must call this (only process 0 then writes the file).
    Fully-addressable leaves (single host, any sharding) take the direct
    ``device_get`` path.
    """
    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(leaf, tree)


def save_checkpoint(path_dir: str, step: int, state: Dict[str, Any],
                    keep: int = 3):
    """Serialize a pytree state dict to <dir>/model-<step>.ckpt."""
    os.makedirs(path_dir, exist_ok=True)
    state = serialization.to_state_dict(jax.device_get(state))
    blob = serialization.msgpack_serialize(
        {"step": np.asarray(step), "state": state})
    path = os.path.join(path_dir, f"model-{step}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if keep > 0:
        clean_checkpoints(path_dir, keep)
    return path


def load_checkpoint(path: str) -> Tuple[int, Dict[str, Any]]:
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    return int(data["step"]), data["state"]


def latest_checkpoint_path(path_dir: str) -> Optional[str]:
    ckpts = _list_ckpts(path_dir)
    return ckpts[-1][1] if ckpts else None


def _list_ckpts(path_dir):
    out = []
    if not os.path.isdir(path_dir):
        return out
    for name in os.listdir(path_dir):
        m = re.fullmatch(r"model-(\d+)\.ckpt", name)
        if m:
            out.append((int(m.group(1)), os.path.join(path_dir, name)))
    return sorted(out)


def clean_checkpoints(path_dir: str, n_ckpts_to_keep: int = 3):
    """Keep the newest N by step number (utils.py:292-310 semantics)."""
    ckpts = _list_ckpts(path_dir)
    for _, path in ckpts[:-n_ckpts_to_keep] if n_ckpts_to_keep > 0 else []:
        os.remove(path)
