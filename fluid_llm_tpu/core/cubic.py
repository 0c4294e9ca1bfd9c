"""Cubic (HCT) mesh->grid interpolation — offline/parity path.

The reference vendors matplotlib's full ``CubicTriInterpolator`` (HCT
elements, DOF estimators, sparse CG solver — ``src/_triinterpolate.py:
287-1398``) but the production pipeline only ever calls the *linear* path
(``to_grid``, ``mesh_utils.py:82-91``).  Rather than re-vendoring ~1,100
lines, this module delegates the cubic evaluation to stock matplotlib (the
same implementation the reference copied) and exposes it with the framework's
``to_grid`` interface, for parity experiments.

The linear hot path stays the precomputed gather op in ``core/interp.py``.
"""

from __future__ import annotations

import numpy as np


def to_grid_cubic(
    val: np.ndarray,
    pos: np.ndarray,
    faces: np.ndarray,
    grid_x: np.ndarray,
    grid_y: np.ndarray,
    kind: str = "min_E",
) -> tuple[np.ndarray, np.ndarray]:
    """Cubic-interpolate a nodal field onto the grid; masked pixels -> 0.

    ``kind``: matplotlib's gradient-estimation mode ("min_E", "geom",
    "user").  Returns (data, mask) matching ``to_grid`` semantics.
    """
    from matplotlib import tri as mtri

    triang = mtri.Triangulation(pos[:, 0], pos[:, 1], triangles=faces)
    interp = mtri.CubicTriInterpolator(triang, np.asarray(val, np.float64), kind=kind)
    m = interp(grid_x, grid_y)
    data = np.asarray(m.data, np.float32).copy()
    mask = np.asarray(m.mask, bool)
    data[mask] = 0.0
    return data, mask


def resample_sequence_cubic(node_states, pos, faces, grid_x, grid_y, kind="min_E"):
    """(T, C, N_nodes) -> (T, C, H, W) cubic-resampled window."""
    T, C = node_states.shape[:2]
    out = np.zeros((T, C) + grid_x.shape, np.float32)
    mask = None
    for t in range(T):
        for c in range(C):
            out[t, c], mask = to_grid_cubic(node_states[t, c], pos, faces, grid_x, grid_y, kind)
    return out, mask
