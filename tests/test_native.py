"""Native meshcore locator: agreement with matplotlib's trifinder."""

import numpy as np
import pytest
from matplotlib import tri as mtri

from fluid_llm_tpu.core import _native
from fluid_llm_tpu.core.triangulation import grid_pos

from test_interp import make_mesh


@pytest.mark.skipif(not _native.available(), reason="native meshcore not built")
def test_native_locator_agrees_with_matplotlib(rng):
    pos, faces = make_mesh(rng, nx=14, ny=9)
    gx, gy = grid_pos(0.0, 2.0, 0.0, 1.0, 120)
    ours = _native.locate(pos, faces, gx, gy)

    triang = mtri.Triangulation(pos[:, 0], pos[:, 1], triangles=faces)
    mpl = np.asarray(triang.get_trifinder()(gx, gy))

    # interior/exterior must agree except exactly-on-edge pixels
    disagree = (ours == -1) != (mpl == -1)
    assert disagree.mean() < 0.005
    # where both found a triangle, barycentric interp must be identical
    both = (ours >= 0) & (mpl >= 0)
    val = (pos[:, 0] * 2 + pos[:, 1] ** 2).astype(np.float64)

    def interp(tri_idx):
        v = faces[np.where(tri_idx >= 0, tri_idx, 0)]
        a, b, c = pos[v[..., 0]], pos[v[..., 1]], pos[v[..., 2]]
        d = (b[..., 1] - c[..., 1]) * (a[..., 0] - c[..., 0]) + (c[..., 0] - b[..., 0]) * (
            a[..., 1] - c[..., 1]
        )
        w0 = ((b[..., 1] - c[..., 1]) * (gx - c[..., 0]) + (c[..., 0] - b[..., 0]) * (gy - c[..., 1])) / d
        w1 = ((c[..., 1] - a[..., 1]) * (gx - c[..., 0]) + (a[..., 0] - c[..., 0]) * (gy - c[..., 1])) / d
        w2 = 1 - w0 - w1
        return w0 * val[v[..., 0]] + w1 * val[v[..., 1]] + w2 * val[v[..., 2]]

    np.testing.assert_allclose(interp(ours)[both], interp(mpl)[both], atol=1e-6)


@pytest.mark.skipif(not _native.available(), reason="native meshcore not built")
def test_native_locator_in_pipeline(rng, monkeypatch):
    """Force the native path inside get_mesh_interpolation."""
    import fluid_llm_tpu.core.triangulation as T

    pos, faces = make_mesh(rng, nx=10, ny=6)

    def no_mpl_locate(p, f, gx, gy):
        return _native.locate(p, f, gx, gy)

    monkeypatch.setattr(T, "locate_triangles", no_mpl_locate)
    interp = T.get_mesh_interpolation(pos, faces, grid_res=60)
    assert interp.mask.shape == interp.tri_index.shape
    assert (~interp.mask).sum() > 0
