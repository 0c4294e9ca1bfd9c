"""Graph-model N-RMSE: interpolate node states to the grid, then N-RMSE.

Equivalent of ``eagle/eagle_utils.py:60-130`` (``get_nrmse``): predicted and
true node states are resampled onto the uniform grid through the same linear
triangulation interpolation as the main pipeline, masked, and scored with
``calc_n_rmse``.  Here the per-mesh geometry is precomputed once and the
per-step resample is the batched on-device gather (``core/interp.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.core.interp import resample_to_grid
from fluid_llm_tpu.core.triangulation import get_mesh_interpolation
from fluid_llm_tpu.train.metrics import calc_n_rmse


def get_nrmse(
    true_states: np.ndarray,
    pred_states: np.ndarray,
    mesh_pos: np.ndarray,
    faces: np.ndarray,
    resolution: int = 238,
) -> np.ndarray:
    """true/pred: (bs, seq, N_nodes, C>=3); mesh_pos: (N_nodes, 2);
    faces: (F, 3).  Uses channels [:3] = (Vx, Vy, P) like the reference.
    Returns per-(batch, step) N-RMSE."""
    interp = get_mesh_interpolation(np.asarray(mesh_pos), np.asarray(faces), resolution)

    def to_imgs(states):
        # (bs, seq, N, C) -> (bs, seq, 3, H, W)
        vals = jnp.moveaxis(jnp.asarray(states[..., :3]), -1, -2)
        return resample_to_grid(
            vals, jnp.asarray(interp.vert_idx), jnp.asarray(interp.weights),
            jnp.asarray(interp.mask),
        )

    true_imgs = to_imgs(true_states)
    pred_imgs = to_imgs(pred_states)
    seq_len = true_imgs.shape[1]
    mask = jnp.asarray(interp.mask)[None, None, None]
    mask = jnp.broadcast_to(mask, (1, seq_len, 3) + interp.shape)
    return np.asarray(calc_n_rmse(pred_imgs, true_imgs, mask))
