from diff_vits_tpu.ops.mas import maximum_path
from diff_vits_tpu.ops.spline import (
    piecewise_rational_quadratic_transform,
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)


def fused_gate(specific_env: str, use_fused, *, default: bool = False) -> bool:
    """Resolve a module's fused-kernel routing.

    ``use_fused`` True/False wins outright; 'auto' consults the
    per-kernel-family env var (e.g. DIFF_VITS_FUSED_RESNET), then the
    global DIFF_VITS_FUSED, then ``default`` (the measured-faster choice
    for the production shapes).
    """
    if use_fused != "auto":
        return bool(use_fused)
    import os
    v = os.environ.get(specific_env)
    if v is None:
        v = os.environ.get("DIFF_VITS_FUSED")
    if v is not None:
        return v.strip().lower() not in ("0", "false", "off")
    return default
