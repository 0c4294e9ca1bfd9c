"""Mesh->grid resample parity vs matplotlib's LinearTriInterpolator oracle.

The vendored interpolator in the reference (``src/_triinterpolate.py``) is
matplotlib's own, modified only to accept a precomputed tri_index — so stock
matplotlib is a perfect oracle for the linear path.
"""

import numpy as np
import pytest
from matplotlib import tri as mtri

from fluid_llm_tpu.core.interp import resample_to_grid
from fluid_llm_tpu.core.triangulation import (
    _locate_numpy,
    get_mesh_interpolation,
    grid_pos,
)


def make_mesh(rng, nx=12, ny=7):
    """Perturbed structured triangulated mesh over a rectangle."""
    xs = np.linspace(0.0, 2.0, nx)
    ys = np.linspace(0.0, 1.0, ny)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    jitter = rng.uniform(-0.25, 0.25, size=(nx, ny, 2)) * np.array(
        [xs[1] - xs[0], ys[1] - ys[0]]
    )
    jitter[0, :, 0] = jitter[-1, :, 0] = 0.0
    jitter[:, 0, 1] = jitter[:, -1, 1] = 0.0
    pos = np.stack([X + jitter[..., 0], Y + jitter[..., 1]], axis=-1).reshape(-1, 2)

    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = (
                i * ny + j,
                (i + 1) * ny + j,
                (i + 1) * ny + j + 1,
                i * ny + j + 1,
            )
            faces.append([a, b, c])
            faces.append([a, c, d])
    return pos, np.array(faces, dtype=np.int32)


def test_grid_pos_matches_reference(rng):
    """Aspect-preserving grid (mesh_utils.py:64-79) — compare to np.mgrid."""
    gx, gy = grid_pos(0.0, 2.0, 0.0, 0.82, 238)
    mx, my = np.mgrid[0.0:2.0:238j, 0.0:0.82:(int(238 * 0.41)) * 1j]
    assert gx.shape == (238, int(238 * 0.41))
    np.testing.assert_allclose(gx, mx.astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(gy, my.astype(np.float32), atol=1e-6)


def test_resample_matches_matplotlib(rng):
    pos, faces = make_mesh(rng)
    interp = get_mesh_interpolation(pos, faces, grid_res=100)

    val = np.sin(pos[:, 0] * 3) + np.cos(pos[:, 1] * 5) + rng.normal(size=len(pos)) * 0.1
    val = val.astype(np.float32)

    ours = np.asarray(
        resample_to_grid(val, interp.vert_idx, interp.weights, interp.mask)
    )

    triang = mtri.Triangulation(pos[:, 0], pos[:, 1], triangles=faces)
    oracle_m = mtri.LinearTriInterpolator(triang, val)(interp.grid_x, interp.grid_y)
    oracle = oracle_m.data.copy()
    oracle[oracle_m.mask] = 0.0

    # mask parity must be exact; values to fp tolerance
    np.testing.assert_array_equal(interp.mask, oracle_m.mask)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_numpy_locator_agrees_with_matplotlib(rng):
    pos, faces = make_mesh(rng, nx=8, ny=5)
    gx, gy = grid_pos(0.0, 2.0, 0.0, 1.0, 60)
    triang = mtri.Triangulation(pos[:, 0], pos[:, 1], triangles=faces)
    mpl_idx = np.asarray(triang.get_trifinder()(gx, gy))
    np_idx = _locate_numpy(pos, faces, gx, gy)
    # Interior/exterior decision must agree except possibly exactly-on-edge
    # pixels; on this jittered mesh none land exactly on an edge.
    disagree = (mpl_idx == -1) != (np_idx == -1)
    assert disagree.mean() < 0.01
    # Where both assign a triangle, interpolated values must agree even if the
    # triangle id differs (shared-edge points interpolate identically).
    val = (pos[:, 0] ** 2 + pos[:, 1]).astype(np.float32)
    both = (mpl_idx >= 0) & (np_idx >= 0)
    interp = get_mesh_interpolation(pos, faces, grid_res=60)
    ours = np.asarray(resample_to_grid(val, interp.vert_idx, interp.weights, interp.mask))
    oracle = mtri.LinearTriInterpolator(triang, val)(gx, gy).data
    np.testing.assert_allclose(ours[both], oracle[both], atol=1e-4)


def test_resample_batched_channels(rng):
    pos, faces = make_mesh(rng)
    interp = get_mesh_interpolation(pos, faces, grid_res=64)
    vals = rng.normal(size=(5, 3, len(pos))).astype(np.float32)
    out = np.asarray(resample_to_grid(vals, interp.vert_idx, interp.weights, interp.mask))
    assert out.shape == (5, 3) + interp.shape
    single = np.asarray(
        resample_to_grid(vals[2, 1], interp.vert_idx, interp.weights, interp.mask)
    )
    np.testing.assert_allclose(out[2, 1], single, atol=1e-6)
