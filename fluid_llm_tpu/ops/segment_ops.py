"""Batched segment/gather ops for mesh-graph message passing.

TPU-native replacement for torch-scatter's CUDA ``scatter_sum``
(``eagle/Models/Base.py:3,44,82``): XLA's ``segment_sum`` lowers to
sorted-scatter which the TPU handles natively; everything is static-shape
(ghost-padded edges, see ``data/eagle_mesh.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_nodes(V: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """V: (B, N, F); idx: (B, E) int -> (B, E, F) (torch.gather dim=-2)."""
    return jnp.take_along_axis(V, idx[..., None], axis=-2)


def segment_sum_nodes(values: jnp.ndarray, idx: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """values: (B, E, F); idx: (B, E) int -> (B, N, F) summed per node."""

    def one(v, i):
        return jax.ops.segment_sum(v, i, num_segments=num_nodes)

    return jax.vmap(one)(values, idx)
