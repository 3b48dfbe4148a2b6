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


def param_sharding_rules(mesh: Mesh, params):
    """Parameter shardings: replicated by default.

    The UNet is ~O(50M) params — comfortably replicated on v5e (16 GB HBM).
    A 'model' axis rule set (shard attention/ffn kernels over 'model') can be
    layered in here when configs outgrow a single HBM.
    """
    repl = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda _: repl, params)
