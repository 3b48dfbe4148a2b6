from diff_vits_tpu.ops.mas import maximum_path
from diff_vits_tpu.ops.spline import (
    piecewise_rational_quadratic_transform,
    rational_quadratic_spline,
    unconstrained_rational_quadratic_spline,
)
