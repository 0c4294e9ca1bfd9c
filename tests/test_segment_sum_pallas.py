"""Parity tests for the window-local segment-sum / gather Pallas kernels
(``ops/segment_sum_pallas``) and their dispatch through
``ops/segment_ops`` — interpret mode on the CPU suite; the real Mosaic
toolchain is re-qualified by ``tpu_smoke segment_sum``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops import segment_ops as so
from fluid_llm_tpu.ops import segment_sum_pallas as ssp


def mesh_like_ids(rng, e, n):
    """Sorted ids with mesh-like density (every chunk spans few rows)."""
    return np.sort(rng.integers(0, n, size=e)).astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("e,n,f", [(1024, 300, 128), (700, 129, 60), (512, 40, 130)])
def test_scatter_matches_xla(dtype, e, n, f):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(mesh_like_ids(rng, e, n))
    vals = jnp.asarray(rng.normal(size=(e, f)), dtype)
    got = ssp.segment_sum_flat(vals, ids, n, interpret=True)
    ref = jax.ops.segment_sum(vals.astype(jnp.float32), ids, num_segments=n)
    assert got.shape == (n, f) and got.dtype == dtype
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=5e-2 if dtype == jnp.bfloat16 else 1e-5,
                               rtol=1e-2 if dtype == jnp.bfloat16 else 1e-6)


@pytest.mark.parametrize("e,n,f", [(1024, 300, 128), (512, 129, 60)])
def test_gather_matches_take(e, n, f):
    rng = np.random.default_rng(1)
    ids = jnp.asarray(mesh_like_ids(rng, e, n))
    nodes = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    got = ssp.gather_flat(nodes, ids, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(nodes)[np.asarray(ids)],
                               rtol=1e-6)


def test_unsorted_window_local_ids_use_kernel_and_match():
    """UNSORTED ids whose chunk spans fit the window ride the kernel
    (the r5 contract: window-locality, not sortedness)."""
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 50, size=512), jnp.int32)  # NOT sorted
    vals = jnp.asarray(rng.normal(size=(512, 32)), jnp.float32)
    got = ssp.segment_sum_flat(vals, ids, 50, interpret=True,
                               assume_windowed=True)
    ref = jax.ops.segment_sum(vals, ids, num_segments=50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    got_g = ssp.gather_flat(vals, ids[:512], interpret=True,
                            assume_windowed=True)  # rows exist: n=512
    ref_g = np.asarray(vals)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(got_g), ref_g, rtol=1e-6)


def test_banded_unsorted_ids_kernel_parity():
    """RCM-banded pattern: ids wander within a moving band (|id - trend|
    bounded) — unsorted, window-local, kernel == XLA, incl. a custom
    1024 window and out-of-range ghosts."""
    rng = np.random.default_rng(12)
    e, n, f = 2048, 1500, 64
    trend = np.sort(rng.integers(0, n - 1, size=e))
    ids_np = np.clip(trend + rng.integers(-100, 100, size=e), 0, n - 1)
    ids_np[rng.random(e) < 0.05] = n + 7  # droppable ghosts (out of range)
    assert np.any(np.diff(ids_np) < 0)  # premise: genuinely unsorted
    for window in (512, 1024):
        assert ssp.host_kernel_ok(ids_np, n, window=window)
        ids = jnp.asarray(ids_np, jnp.int32)
        vals = jnp.asarray(rng.normal(size=(e, f)), jnp.float32)
        got = ssp.segment_sum_flat(vals, ids, n, interpret=True,
                                   assume_windowed=True, window=window)
        ref = jax.ops.segment_sum(vals, ids, num_segments=n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        nodes = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
        gg = ssp.gather_flat(nodes, ids, interpret=True,
                             assume_windowed=True, window=window)
        ref_g = np.where((ids_np < n)[:, None], np.asarray(nodes)[np.minimum(ids_np, n - 1)], 0)
        np.testing.assert_allclose(np.asarray(gg), ref_g, rtol=1e-6)


def test_window_overflow_falls_back():
    """Sorted ids whose chunk span exceeds WINDOW take the XLA branch."""
    rng = np.random.default_rng(3)
    n = 4096
    ids = np.sort(rng.choice(n, size=ssp.CHUNK, replace=False)).astype(np.int32)
    assert ids[-1] - ids[0] > ssp.WINDOW  # premise: a hub-sparse chunk
    vals = jnp.asarray(rng.normal(size=(ssp.CHUNK, 16)), jnp.float32)
    got = ssp.segment_sum_flat(vals, jnp.asarray(ids), n, interpret=True)
    ref = jax.ops.segment_sum(vals, jnp.asarray(ids), num_segments=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_out_of_range_ids_dropped():
    """ids == num_segments (ghost-beyond) contribute nothing, as XLA."""
    ids = jnp.asarray(np.r_[np.repeat(np.arange(8), 32), np.full(256, 20)],
                      jnp.int32)
    vals = jnp.ones((512, 8), jnp.float32)
    got = ssp.segment_sum_flat(vals, ids, 20, interpret=True)
    ref = jax.ops.segment_sum(vals, ids, num_segments=20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
    g2 = ssp.gather_flat(vals[:20], ids, interpret=True)
    assert np.all(np.asarray(g2)[256:] == 0)  # zero rows, not clamp


def test_public_api_batched_dispatch(monkeypatch):
    """segment_sum_nodes/gather_nodes route (B, E) batches through the
    kernel (interpret) and match the XLA twins; grads agree too."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    rng = np.random.default_rng(4)
    B, E, N, F = 3, 512, 200, 64
    ids = jnp.asarray(np.stack([mesh_like_ids(rng, E, N) for _ in range(B)]))
    vals = jnp.asarray(rng.normal(size=(B, E, F)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)

    got = so.segment_sum_nodes(vals, ids, N)
    ref = jax.vmap(lambda v, i: jax.ops.segment_sum(v, i, num_segments=N))(vals, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    gat = so.gather_nodes(V, ids)
    refg = jnp.take_along_axis(V, ids[..., None], axis=-2)
    np.testing.assert_allclose(np.asarray(gat), np.asarray(refg), rtol=1e-6)

    def loss_k(v):
        return (so.segment_sum_nodes(v, ids, N) ** 2).sum()

    def loss_x(v):
        return (ref_ss(v) ** 2).sum()

    ref_ss = lambda v: jax.vmap(
        lambda vv, i: jax.ops.segment_sum(vv, i, num_segments=N))(v, ids)
    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(vals)),
                               np.asarray(jax.grad(loss_x)(vals)),
                               atol=1e-4, rtol=1e-4)

    def gloss_k(v):
        return (so.gather_nodes(v, ids) ** 3).sum()

    def gloss_x(v):
        return (jnp.take_along_axis(v, ids[..., None], axis=-2) ** 3).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(gloss_k)(V)),
                               np.asarray(jax.grad(gloss_x)(V)),
                               atol=1e-4, rtol=1e-4)


def test_public_api_4d_values(monkeypatch):
    """gatnet shape: values (B, E, H, C) with multi feature dims."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    rng = np.random.default_rng(5)
    B, E, N, H, C = 2, 384, 100, 4, 16
    ids = jnp.asarray(np.stack([mesh_like_ids(rng, E, N) for _ in range(B)]))
    vals = jnp.asarray(rng.normal(size=(B, E, H, C)), jnp.float32)
    got = so.segment_sum_nodes(vals, ids, N)
    ref = jax.vmap(lambda v, i: jax.ops.segment_sum(v, i, num_segments=N))(vals, ids)
    assert got.shape == (B, N, H, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_static_windowed_promise(monkeypatch):
    """windowed=True calls the kernel with NO runtime cond (the hot-path
    contract); windowed=False forces XLA; results identical."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    rng = np.random.default_rng(7)
    B, E, N, F = 2, 512, 150, 32
    ids = jnp.asarray(np.stack([mesh_like_ids(rng, E, N) for _ in range(B)]))
    vals = jnp.asarray(rng.normal(size=(B, E, F)), jnp.float32)
    a = so.segment_sum_nodes(vals, ids, N, windowed=True)
    b = so.segment_sum_nodes(vals, ids, N, windowed=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    V = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    ga = so.gather_nodes(V, ids, windowed=True)
    gb = so.gather_nodes(V, ids, windowed=False)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6)
    # grads ride the same static dispatch
    da = jax.grad(lambda v: (so.segment_sum_nodes(v, ids, N, windowed=True) ** 2).sum())(vals)
    db = jax.grad(lambda v: (so.segment_sum_nodes(v, ids, N, windowed=False) ** 2).sum())(vals)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-4, rtol=1e-4)


def test_per_batch_out_of_range_ids_dropped(monkeypatch):
    """A per-batch id == num_nodes must be DROPPED on the kernel path, not
    aliased into the next batch element's segment 0 by the flatten offset
    (ADVICE r4); both dispatch branches agree with the vmapped XLA twin."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    rng = np.random.default_rng(9)
    B, E, N, F = 2, 512, 100, 32
    ids_np = np.stack([mesh_like_ids(rng, E, N) for _ in range(B)])
    ids_np[:, -5:] = N  # out of range per batch (== num_nodes)
    ids = jnp.asarray(ids_np)
    vals = jnp.asarray(rng.normal(size=(B, E, F)), jnp.float32)
    ref = jax.vmap(lambda v, i: jax.ops.segment_sum(v, i, num_segments=N))(vals, ids)
    for s in (True, "auto"):
        got = so.segment_sum_nodes(vals, ids, N, windowed=s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    # gather: out-of-range -> zero rows on every path (incl. the XLA twin)
    V = jnp.asarray(rng.normal(size=(B, N, F)), jnp.float32)
    for s in (True, False):
        g = so.gather_nodes(V, ids, windowed=s)
        assert np.all(np.asarray(g)[:, -5:] == 0)


def test_host_kernel_ok_mirrors_predicate():
    rng = np.random.default_rng(8)
    good = np.stack([mesh_like_ids(rng, 1024, 300) for _ in range(3)])
    assert ssp.host_kernel_ok(good, 300)
    # unsorted is fine as long as spans stay window-local (n=300 < window)
    assert ssp.host_kernel_ok(good[:, ::-1], 300)
    sparse = np.sort(rng.choice(100_000, size=ssp.CHUNK, replace=False)).astype(np.int32)
    assert not ssp.host_kernel_ok(sparse[None], 100_000)  # span overflow
    assert ssp.min_window(sparse[None], 100_000) == 0
    banded = np.arange(ssp.CHUNK) * 3  # span 765: needs the 1024 window
    assert not ssp.host_kernel_ok(banded[None], 100_000)
    assert ssp.min_window(banded[None], 100_000) == 1024
    # out-of-range ids are droppable ghosts and must not break the span
    ghosted = good.copy()
    ghosted[:, -50:] = 301
    assert ssp.host_kernel_ok(ghosted, 300)


def test_collated_batches_satisfy_contract():
    """The real pipeline (synthetic graphs -> collate) honours the window
    contract the models statically promise — for the sorted column AND,
    after the r5 ghost-receiver rewrite, for ``edges[..., 1]`` too."""
    from fluid_llm_tpu.data.eagle_mesh import collate_graphs, static_bucket_sizes
    from fluid_llm_tpu.data.synthetic import SyntheticGraphDataset

    ds = SyntheticGraphDataset(n_trajectories=4, mesh_nodes=(24, 10),
                               mode="train", window_length=2)
    n_max, e_max, c_max, k_max = static_bucket_sizes(ds)
    batch = collate_graphs([ds[j] for j in range(4)], n_max, e_max, c_max,
                           1, k_max=k_max)
    assert ssp.host_kernel_ok(batch["edges"][..., 0],
                              batch["mesh_pos"].shape[-2])
    # grid meshes are banded in their natural order: col-1 flag nonzero
    assert batch["_rev_window"] in ssp.WINDOW_CHOICES
    assert ssp.host_kernel_ok(batch["edges"][:, 0, :, 1],
                              batch["mesh_pos"].shape[-2],
                              window=batch["_rev_window"])


def test_reorder_makes_cluster_ids_window_local():
    """cluster-major reorder (data/reorder): flags engage for clusters AND
    edges; relabeled sample is the same physics (fields permuted)."""
    from fluid_llm_tpu.data.eagle_mesh import collate_graphs, static_bucket_sizes
    from fluid_llm_tpu.data.reorder import reorder_sample
    from fluid_llm_tpu.data.synthetic import SyntheticGraphDataset

    ds = SyntheticGraphDataset(n_trajectories=2, mesh_nodes=(24, 10),
                               mode="valid", window_length=2, n_cluster=6)
    n_max, e_max, c_max, k_max = static_bucket_sizes(ds)
    samples = [ds[j] for j in range(2)]
    rs = [reorder_sample(s) for s in samples]

    # permutation-consistency: sorted node coordinate multiset unchanged,
    # edge set identical up to relabeling
    for s, r in zip(samples, rs):
        np.testing.assert_allclose(
            np.sort(s.mesh_pos[0], axis=0), np.sort(r.mesh_pos[0], axis=0))
        pos = {tuple(np.round(p, 6)) for p in s.mesh_pos[0]}
        assert pos == {tuple(np.round(p, 6)) for p in r.mesh_pos[0]}
        es = {(tuple(np.round(s.mesh_pos[0][a], 6)), tuple(np.round(s.mesh_pos[0][b], 6)))
              for a, b in s.edges}
        er = {(tuple(np.round(r.mesh_pos[0][a], 6)), tuple(np.round(r.mesh_pos[0][b], 6)))
              for a, b in r.edges}
        assert es == er
        # every real node in exactly one cluster, before and after
        m = r.cluster[0][r.cluster[0] >= 0]
        assert np.array_equal(np.sort(m), np.arange(s.mesh_pos.shape[1]))

    batch = collate_graphs(rs, n_max, e_max, c_max, 2, k_max=k_max)
    assert batch["_cluster_window"] in ssp.WINDOW_CHOICES
    assert batch["_rev_window"] in ssp.WINDOW_CHOICES


def test_faces_to_edges_sorted():
    from fluid_llm_tpu.data.eagle_mesh import faces_to_edges

    rng = np.random.default_rng(6)
    faces = rng.integers(0, 50, size=(80, 3))
    edges = faces_to_edges(faces)
    assert np.all(np.diff(edges[:, 0]) >= 0)  # aggregation column sorted
    # set parity with the unsorted construction (same undirected edge set)
    s = {tuple(e) for e in edges.tolist()}
    assert all((b, a) in s for a, b in s)
