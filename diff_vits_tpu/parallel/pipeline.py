"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.9 — DP only). This
module supplies the TPU-native form for stacks of *identical* layers (the
PromptEncoder's EncSALayer stack, a transformer trunk): each device on the
``stage`` mesh axis holds one contiguous group of layers' parameters;
microbatches stream through the ring, activations hop stage-to-stage with
``lax.ppermute`` over ICI, and every device computes on every tick once the
pipeline fills (the classic schedule: ``n_micro + n_stage - 1`` ticks,
bubble fraction ``(n_stage-1)/(n_micro+n_stage-1)``).

Parameters are "stacked" pytrees: each leaf has a leading ``n_layers`` axis
(the idiomatic JAX form for scan-over-layers); the stage axis shards that
leading axis, so pipeline parallelism is *also* a parameter shard — per-chip
parameter memory drops n_stage-fold, like 1F1B implementations.

Usage::

    fn = make_pipeline(layer_fn, mesh, n_microbatches=8)   # mesh has 'stage'
    y = fn(stacked_params, x)       # == sequential scan of layer_fn

``layer_fn(params_i, x) -> y`` must be shape-preserving (same x/y shape),
as in any homogeneous-stack pipeline.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _stage_body(layer_fn: Callable, params, x_micro, *, axis_name: str,
                n_micro: int):
    """Per-stage program (runs under shard_map, one shard per stage).

    params: this stage's layer parameters, leading axis = layers-per-stage.
    x_micro: [n_micro_local, ...] — the full microbatch queue lives on
    stage 0 (callers shard the microbatch axis fully to stage 0 via
    masking; here every stage receives the same queue and stage 0's copy
    is the one that matters, which keeps the shard_map specs replicated
    and the schedule simple).
    """
    stage = jax.lax.axis_index(axis_name)
    n_stage = jax.lax.psum(1, axis_name)
    n_ticks = n_micro + n_stage - 1

    def apply_stage(x):
        # sequential scan over this stage's local layers
        def body(h, p):
            return layer_fn(p, h), None
        h, _ = jax.lax.scan(body, x, params)
        return h

    state = jnp.zeros_like(x_micro[0])   # activation currently held
    outputs = jnp.zeros_like(x_micro)    # collected on the last stage
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def tick(t, carry):
        state, outputs = carry
        # stage 0 ingests microbatch t (while t < n_micro)
        feed = x_micro[jnp.minimum(t, n_micro - 1)]
        state = jnp.where((stage == 0) & (t < n_micro), feed, state)
        state = apply_stage(state)
        # last stage emits microbatch t-(n_stage-1)
        out_idx = t - (n_stage - 1)
        emit = (stage == n_stage - 1) & (out_idx >= 0)
        outputs = jax.lax.cond(
            emit,
            lambda o: o.at[jnp.maximum(out_idx, 0)].set(state),
            lambda o: o,
            outputs)
        # rotate activations one stage forward
        state = jax.lax.ppermute(state, axis_name, perm)
        return state, outputs

    _, outputs = jax.lax.fori_loop(0, n_ticks, tick, (state, outputs))
    # the results live on the last stage; share them with every stage so
    # the shard_map output spec can stay replicated
    outputs = jax.lax.psum(
        jnp.where(stage == n_stage - 1, outputs, jnp.zeros_like(outputs)),
        axis_name)
    return outputs


def make_pipeline(layer_fn: Callable, mesh: Mesh, n_microbatches: int,
                  axis_name: str = "stage"):
    """Build ``f(stacked_params, x) -> y`` running ``layer_fn`` over a
    stacked-parameter layer stack, pipelined over ``axis_name``.

    stacked_params: pytree, leaves [n_layers, ...] with n_layers divisible
    by the stage-axis size (each stage holds n_layers/n_stage layers).
    x: [batch, ...] with batch divisible by ``n_microbatches``.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    import inspect
    kwargs = {}
    sig = inspect.signature(shard_map).parameters
    if "check_rep" in sig:
        kwargs["check_rep"] = False
    elif "check_vma" in sig:
        kwargs["check_vma"] = False

    n_stage = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]

    def fn(stacked_params, x):
        n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
        if n_layers % n_stage:
            raise ValueError(f"{n_layers} layers not divisible by "
                             f"{n_stage} stages")
        b = x.shape[0]
        if b % n_microbatches:
            raise ValueError(f"batch {b} not divisible by "
                             f"{n_microbatches} microbatches")
        x_micro = x.reshape((n_microbatches, b // n_microbatches)
                            + x.shape[1:])

        p_specs = jax.tree_util.tree_map(
            lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params)
        body = partial(_stage_body, layer_fn, axis_name=axis_name,
                       n_micro=n_microbatches)
        y_micro = shard_map(
            body, mesh=mesh, in_specs=(p_specs, P()), out_specs=P(),
            **kwargs)(stacked_params, x_micro)
        return y_micro.reshape((b,) + x.shape[1:])

    return fn
