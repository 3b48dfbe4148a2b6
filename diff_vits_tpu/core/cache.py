"""Persistent XLA compilation cache.

The flagship training step and the fused sampler graphs are large programs;
first-compile on a TPU backend can take minutes. Enabling JAX's persistent
compilation cache makes every CLI after the first start in seconds. The
reference has no analogue (torch eager). Off by default only if the user
sets ``DIFF_VITS_NO_COMPILE_CACHE=1``.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/diff_vits_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("DIFF_VITS_NO_COMPILE_CACHE"):
        return
    import jax

    path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # older jax without these knobs
        pass
