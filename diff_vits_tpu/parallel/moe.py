"""Mixture-of-Experts feed-forward with expert parallelism.

The reference has no MoE/expert parallelism (SURVEY.md §2.9). This module
supplies the TPU-native capability: a top-k-gated expert feed-forward whose
stacked expert parameters shard over an ``expert`` mesh axis — GSPMD
partitions the per-expert einsums across devices and inserts one AllReduce
for the gate-weighted combine, the standard dense-dispatch EP formulation
(every expert sees every token; no token dropping, no capacity factor, no
load-balancing loss needed for correctness — fine at the expert counts a
TTS-scale model would use, and fully deterministic).

Usage: ``MoEFeedForward`` as a drop-in for a GEGLU feed-forward
(``BasicTransformerBlock(moe_experts=E)`` routes through it), params
sharded with ``expert_sharding_rules`` when the mesh has an 'expert' axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEFeedForward(nn.Module):
    """Top-k gated expert GEGLU feed-forward over [B, T, C] tokens.

    Dense dispatch: expert outputs are computed for all tokens with one
    stacked einsum (MXU-batched over the expert axis — the axis EP shards),
    then combined with the renormalized top-k gate weights.
    """
    dim: int
    num_experts: int
    top_k: int = 2
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        e, d, h = self.num_experts, self.dim, self.dim * self.mult
        gate_logits = nn.Dense(e, use_bias=False, dtype=self.dtype,
                               name="gate")(x)               # [B, T, E]
        k = min(self.top_k, e)
        top_vals, top_idx = jax.lax.top_k(gate_logits.astype(jnp.float32), k)
        weights = jax.nn.softmax(top_vals, axis=-1)          # [B, T, k]

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, 2 * h)).astype(self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (e, 2 * h))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, h, d)).astype(self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (e, d))

        # dense dispatch: [B,T,D] x [E,D,2H] -> [E,B,T,2H] (GSPMD shards E)
        u = jnp.einsum("btd,edh->ebth", x, w1) + b1[:, None, None, :]
        a, g = jnp.split(u, 2, axis=-1)
        u = a * nn.gelu(g, approximate=False)
        y = jnp.einsum("ebth,ehd->ebtd", u, w2) + b2[:, None, None, :]

        # gate-weighted combine of the selected experts; the one-hot matmul
        # keeps it an einsum (no gathers), which GSPMD turns into a single
        # AllReduce over the expert axis
        onehot = jax.nn.one_hot(top_idx, e, dtype=jnp.float32)  # [B,T,k,E]
        combine = jnp.einsum("btk,btke->bte", weights, onehot)  # [B,T,E]
        return jnp.einsum("bte,ebtd->btd", combine.astype(y.dtype), y)


def expert_sharding_rules(mesh: Mesh, params, axis_name: str = "expert"):
    """Shard every leaf with a leading num_experts axis over ``axis_name``
    (MoE kernels); everything else replicated. Compose with
    mesh.state_sharding_rules for mixed EP+TP/FSDP trees by applying this
    to the MoE subtree."""
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis_name, 1)

    def spec(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        if size > 1 and getattr(leaf, "ndim", 0) >= 2 and \
                ("w1" in path or "w2" in path or "b1" in path
                 or "b2" in path) and leaf.shape[0] % size == 0:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
