"""On-device mesh->grid resampling: one gather + FMA per field.

Replaces the reference's per-call ``LinearTriInterpolator`` evaluation
(``src/_triinterpolate.py:101-208,258-284`` driven from
``src/dataloader/mesh_utils.py:82-91``) with a jitted gather/contract over the
precomputed :class:`~fluid_llm_tpu.core.triangulation.MeshInterp` arrays.
Masked (outside-mesh) pixels are zeroed, matching ``to_grid``'s
``data[mask] = 0`` semantics (``mesh_utils.py:87-90``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def resample_to_grid(
    node_values: jnp.ndarray,
    vert_idx: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Resample per-node field(s) onto the uniform grid.

    Args:
      node_values: ``(..., N_nodes)`` — leading axes batch channels/steps.
      vert_idx:    ``(H, W, 3)`` int32 from :class:`MeshInterp`.
      weights:     ``(H, W, 3)`` float32 barycentric weights.
      mask:        ``(H, W)`` bool, True outside the mesh.

    Returns:
      ``(..., H, W)`` grid values; masked pixels are exactly 0.
    """
    gathered = node_values[..., vert_idx]  # (..., H, W, 3)
    out = jnp.einsum("...hwk,hwk->...hw", gathered, weights.astype(node_values.dtype))
    return jnp.where(mask, 0.0, out)


def to_grid(val, interp):
    """Convenience mirror of ``mesh_utils.to_grid`` — returns (data, mask)."""
    data = resample_to_grid(
        jnp.asarray(val), jnp.asarray(interp.vert_idx), jnp.asarray(interp.weights),
        jnp.asarray(interp.mask),
    )
    return data, interp.mask


@partial(jax.jit, static_argnames=())
def resample_sequence(
    node_values: jnp.ndarray,
    vert_idx: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Resample a whole trajectory window in one fused call.

    ``node_values``: ``(seq_len, C, N_nodes)`` -> ``(seq_len, C, H, W)``.
    This is the dataset hot path (replaces the per-step, per-channel Python
    loop in ``simple_dataloader.py:104-121,183-191``).
    """
    return resample_to_grid(node_values, vert_idx, weights, mask)
