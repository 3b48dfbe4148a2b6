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


def fused_default_for_batch(batch: int) -> bool:
    """Measured batch-dependent default for the fused UNet kernels.

    Honest on-chip A/B (v5e, fetch-warmed harness): the fused
    resnet+transformer route is a 3.1x win on the latency path (b=1
    30-step sampler: 13.1 vs 40.7 ms), a 19% win on a standalone denoiser
    forward at b=8 (3.19 vs 3.94 ms), and still ~3% ahead **end-to-end**
    at b=32 (full sampler 264.5 vs 272.1 ms — a standalone denoiser call
    at b=32 measures *slower* fused, 15.4 vs 10.6 ms, but that
    microbenchmark re-encodes the prompt per call, which the production
    sampler hoists). Default: fused on TPU up to batch 32 — the largest
    batch measured end-to-end; ``DIFF_VITS_FUSED_MAX_BATCH`` moves the
    cutoff for bigger-batch deployments.
    """
    import os

    import jax
    if jax.default_backend() != "tpu":
        return False
    try:
        limit = int(os.environ.get("DIFF_VITS_FUSED_MAX_BATCH", "32"))
    except ValueError:
        limit = 32
    return batch <= limit
