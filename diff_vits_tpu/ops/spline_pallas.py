"""Pallas TPU kernel for the unconstrained rational-quadratic spline.

Single-program elementwise evaluation of the linear-tail RQ spline
(transforms.py:55-193 semantics, identical to ops/spline.py which is the
XLA formulation and the autodiff path). The per-element bin gather
(``take_along_axis`` over the bins axis) is unrolled into ``num_bins``
masked selects — bins are small (10 in every reference config), so the
whole transform is one VPU program with no gather/scatter lowering.

Used by the flow couplings' inference path (ConvFlow reverse); training
keeps ops/spline.py for autodiff.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diff_vits_tpu.ops.spline import (
    DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_DERIVATIVE)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, w_ref, h_ref, d_ref, out_ref, ld_ref, *, num_bins: int,
            inverse: bool, tail_bound: float, min_bin_width: float,
            min_bin_height: float, min_derivative: float):
    x = x_ref[:].astype(jnp.float32)
    uw = w_ref[:].astype(jnp.float32)
    uh = h_ref[:].astype(jnp.float32)
    ud = d_ref[:].astype(jnp.float32)

    inside = (x >= -tail_bound) & (x <= tail_bound)
    xc = jnp.clip(x, -tail_bound, tail_bound)

    # bin widths/heights: softmax + min-width floor + cumsum over the
    # (static, small) bins axis, scaled to [-tail_bound, tail_bound]
    def bins(u, min_frac):
        p = jax.nn.softmax(u, axis=-1)
        w = min_frac + (1 - min_frac * num_bins) * p
        cum = jnp.cumsum(w, axis=-1) * (2 * tail_bound) - tail_bound
        return cum  # cum[..., k] = right edge of bin k

    cumw = bins(uw, min_bin_width)
    cumh = bins(uh, min_bin_height)
    # boundary derivative constant: softplus(c) == 1 - min_derivative
    const = math.log(math.exp(1 - min_derivative) - 1)
    deriv = min_derivative + jax.nn.softplus(ud)
    d_first = min_derivative + jax.nn.softplus(jnp.float32(const))

    # per-element bin index: count of right edges <= x (searchsorted with
    # the +eps top-edge nudge of ops/spline.py:_searchsorted)
    edges = cumh if inverse else cumw
    idx = jnp.zeros(x.shape, jnp.int32)
    for k in range(num_bins - 1):  # interior right edges; the top edge
        idx = idx + (xc >= edges[..., k]).astype(jnp.int32)  # never counts

    def sel(table, left_edge=False):
        """table[..., idx]; left_edge selects cum[..., idx-1]
        (i.e. the bin's left edge, -tail_bound for bin 0)."""
        out = jnp.zeros(x.shape, jnp.float32)
        for k in range(num_bins):
            if left_edge:
                val = (jnp.full(x.shape, -tail_bound, jnp.float32) if k == 0
                       else table[..., k - 1])
            else:
                val = table[..., k]
            out = out + jnp.where(idx == k, val, 0.0)
        return out

    in_cumw = sel(cumw, left_edge=True)
    right_cumw = sel(cumw)
    in_w = right_cumw - in_cumw
    in_cumh = sel(cumh, left_edge=True)
    right_cumh = sel(cumh)
    in_h = right_cumh - in_cumh
    in_delta = in_h / in_w

    # derivatives table is padded with the boundary constant on both ends:
    # effective deriv at knot j in [0..num_bins]: d_first at 0 and num_bins,
    # else deriv[..., j-1]
    def knot_deriv(j_off):
        out = jnp.zeros(x.shape, jnp.float32)
        for k in range(num_bins):
            j = k + j_off
            if j == 0 or j == num_bins:
                val = jnp.full(x.shape, d_first, jnp.float32)
            else:
                val = deriv[..., j - 1]
            out = out + jnp.where(idx == k, val, 0.0)
        return out

    in_d = knot_deriv(0)
    in_d1 = knot_deriv(1)

    if inverse:
        dy = xc - in_cumh
        s = in_d + in_d1 - 2 * in_delta
        a = dy * s + in_h * (in_delta - in_d)
        bq = in_h * in_d - dy * s
        cq = -in_delta * dy
        disc = bq * bq - 4 * a * cq
        root = (2 * cq) / (-bq - jnp.sqrt(jnp.maximum(disc, 0.0)))
        y = root * in_w + in_cumw
        tom = root * (1 - root)
        den = in_delta + s * tom
        dnum = in_delta ** 2 * (in_d1 * root ** 2 + 2 * in_delta * tom
                                + in_d * (1 - root) ** 2)
        ld = -(jnp.log(dnum) - 2 * jnp.log(den))
    else:
        theta = (xc - in_cumw) / in_w
        tom = theta * (1 - theta)
        s = in_d + in_d1 - 2 * in_delta
        num = in_h * (in_delta * theta ** 2 + in_d * tom)
        den = in_delta + s * tom
        y = in_cumh + num / den
        dnum = in_delta ** 2 * (in_d1 * theta ** 2 + 2 * in_delta * tom
                                + in_d * (1 - theta) ** 2)
        ld = jnp.log(dnum) - 2 * jnp.log(den)

    out_ref[:] = jnp.where(inside, y, x).astype(out_ref.dtype)
    ld_ref[:] = jnp.where(inside, ld, 0.0).astype(ld_ref.dtype)


def unconstrained_rqs_pallas(inputs, unnormalized_widths,
                             unnormalized_heights, unnormalized_derivatives,
                             *, inverse: bool = False,
                             tail_bound: float = 1.0,
                             min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
                             min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
                             min_derivative: float = DEFAULT_MIN_DERIVATIVE,
                             interpret: Optional[bool] = None):
    """Linear-tail RQ spline as one Pallas program.

    ``inputs``: any shape [...]; the parameter tensors are [..., num_bins]
    (derivatives [..., num_bins - 1], the interior knots). Returns
    (outputs, logabsdet) matching ops/spline.py's
    unconstrained_rational_quadratic_spline.
    """
    if interpret is None:
        interpret = _use_interpret()
    num_bins = unnormalized_widths.shape[-1]
    shape = inputs.shape
    x2 = inputs.reshape(-1, shape[-1]) if inputs.ndim > 1 else inputs[None]
    w2 = unnormalized_widths.reshape(x2.shape + (num_bins,))
    h2 = unnormalized_heights.reshape(x2.shape + (num_bins,))
    d2 = unnormalized_derivatives.reshape(x2.shape + (num_bins - 1,))

    kernel = functools.partial(
        _kernel, num_bins=num_bins, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative)
    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    out, ld = pl.pallas_call(
        kernel,
        in_specs=[full(x2), full(w2), full(h2), full(d2)],
        out_specs=[full(x2), full(x2)],
        out_shape=[jax.ShapeDtypeStruct(x2.shape, inputs.dtype),
                   jax.ShapeDtypeStruct(x2.shape, jnp.float32)],
        interpret=interpret,
    )(x2, w2, h2, d2)
    return out.reshape(shape), ld.reshape(shape)
