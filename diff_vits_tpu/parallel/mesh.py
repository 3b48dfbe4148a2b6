"""Device mesh construction and sharding rules (SPMD over ICI/DCN).

Replaces the reference's Accelerate/DDP/NCCL layer (model3.py:1286-1287,
SURVEY.md §2.9): a ``Mesh`` with a ``data`` axis for utterance data
parallelism and an optional ``model`` axis for sharding the UNet when it
exceeds one HBM. Gradients are reduced by pjit-inserted AllReduce over ICI;
there is no explicit communication code — shardings are declared and XLA
inserts collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host init (jax.distributed) — call once per process before any
    device use. No-op in single-process runs."""
    import os
    if "JAX_COORDINATOR_ADDRESS" in os.environ or \
            "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(mesh_shape: Tuple[int, ...] = None,
              axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """Build a mesh over all available devices.

    Default: 1-D data-parallel mesh over every chip. Pass e.g.
    ``mesh_shape=(n//2, 2), axis_names=('data', 'model')`` to reserve a
    model axis.
    """
    n = jax.device_count()
    if mesh_shape is None or int(np.prod(mesh_shape)) != n:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    devices = mesh_utils.create_device_mesh(mesh_shape)
    return Mesh(devices, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


# Megatron-style tensor parallelism by parameter path. "Column" kernels
# shard their output features over the 'model' axis (the activation comes
# out sharded on heads/hidden); the matching "row" kernel shards its input
# features, and GSPMD inserts the single AllReduce that completes the block.
# Everything else (norms, embeddings, small convs) stays replicated.
_COLUMN_HINTS = ("to_q", "to_k", "to_v", "in_proj", "w_q", "w_k", "w_v",
                 "ffn_1", "ff/proj", "pwconv1", "query", "key", "value")
_ROW_HINTS = ("to_out", "out_proj", "ffn_2", "ff/out", "pwconv2", "fc")


def _tp_spec(path: str, leaf, model_size: int, min_size: int,
             fsdp_size: int = 1, fsdp_axis: str = "fsdp") -> P:
    if getattr(leaf, "ndim", 0) < 2 or leaf.size < min_size:
        return P()
    spec = [None] * leaf.ndim
    if model_size > 1:
        if any(h in path for h in _COLUMN_HINTS) and \
                leaf.shape[-1] % model_size == 0:
            spec[-1] = "model"
        elif any(h in path for h in _ROW_HINTS) and \
                leaf.shape[-2] % model_size == 0:
            spec[-2] = "model"
    if fsdp_size > 1:
        # ZeRO-3-style: scatter every large kernel over the 'fsdp' axis on
        # a dim TP left alone; GSPMD all-gathers just-in-time per layer and
        # reduce-scatters its gradient, so per-chip param+optimizer memory
        # drops ~n_fsdp-fold (beyond the reference, which replicates all
        # state on every DDP rank)
        for dim in (-2, -1):
            if spec[dim] is None and leaf.shape[dim] % fsdp_size == 0:
                spec[dim] = fsdp_axis
                break
    return P(*spec)


def param_sharding_rules(mesh: Mesh, params, min_size: int = 1 << 16):
    """Parameter shardings: replicated, with Megatron col/row tensor
    parallelism over the 'model' axis when the mesh has one (>1).

    The flagship UNet is ~O(100M) params — comfortably replicated on v5e
    (16 GB HBM); the 'model' axis exists for configs that outgrow one HBM
    and for latency scaling of the denoise loop. Kernels smaller than
    ``min_size`` elements stay replicated (sharding them costs more in
    collectives than it saves).
    """
    return state_sharding_rules(mesh, params, min_size)


def state_sharding_rules(mesh: Mesh, state, min_size: int = 1 << 16,
                         fsdp_axis: str = "fsdp"):
    """Shardings for a params tree or full train state
    {params, opt_state, step, rng}.

    Optimizer moments mirror the params tree, so the same path-based rules
    apply (the param path is a suffix of the moment path); scalars and PRNG
    keys are replicated. ``fsdp_axis`` names the mesh axis that ZeRO-3
    scatters large kernels over — it may be a dedicated 'fsdp' axis or
    shared with the sequence axis (the usual FSDP+SP pairing: both shard
    "per layer" state that is all-gathered just-in-time).
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_size = sizes.get("model", 1)
    fsdp_size = sizes.get(fsdp_axis, 1)
    # MoE expert kernels (leading num_experts dim, parallel/moe.py) shard
    # over a dedicated 'expert' axis when the mesh has one, else ride the
    # 'model' axis (the usual EP-shares-TP layout at small expert counts)
    ep_axis = "expert" if sizes.get("expert", 1) > 1 else "model"
    ep_size = sizes.get(ep_axis, 1)

    def spec(path_entries, leaf):
        path = "/".join(str(getattr(e, "key", e)) for e in path_entries)
        if "ff_moe" in path and ep_size > 1 and \
                getattr(leaf, "ndim", 0) >= 2 and \
                path.rsplit("/", 1)[-1] in ("w1", "w2", "b1", "b2") and \
                leaf.shape[0] % ep_size == 0:
            return NamedSharding(mesh, P(ep_axis))
        return NamedSharding(mesh, _tp_spec(path, leaf, model_size, min_size,
                                            fsdp_size, fsdp_axis))

    return jax.tree_util.tree_map_with_path(spec, state)
