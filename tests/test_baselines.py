"""EAGLE-baseline models: component parity vs torch oracles + integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from fluid_llm_tpu.data.eagle_mesh import collate_graphs, faces_to_edges
from fluid_llm_tpu.data.synthetic import SyntheticGraphDataset
from fluid_llm_tpu.models.baselines import base as B
from fluid_llm_tpu.models.baselines.dilresnet import (
    dilresnet_apply,
    dilresnet_init,
    dilresnet_loss,
)
from fluid_llm_tpu.models.baselines.gat import gat_apply, gat_init
from fluid_llm_tpu.models.baselines.graphvit import (
    graphvit_apply,
    graphvit_init,
    graphvit_loss,
    gru_init,
    gru_scan,
    mha_apply,
    mha_init,
)
from fluid_llm_tpu.models.baselines.mgn import mgn_apply, mgn_init, mgn_loss
from fluid_llm_tpu.tools.clusterize import constrained_kmeans


def graph_batch(n_traj=2, window=3, n_cluster=0):
    ds = SyntheticGraphDataset(n_trajectories=n_traj, window_length=window,
                               n_cluster=n_cluster, mode="valid")
    samples = [ds[i] for i in range(n_traj)]
    n = max(s.mesh_pos.shape[1] for s in samples)
    e = max(s.edges.shape[0] for s in samples)
    c = max((s.cluster.shape[1] if s.cluster is not None else 1) for s in samples)
    batch = collate_graphs(samples, n, e, c, ghost_type_value=1)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_normalizer_matches_torch_reference(rng):
    """Running-stat arithmetic parity incl. the mean-of-means quirk."""
    state = B.normalizer_init(3, init_std=1.0)
    acc = torch.zeros(3)
    acc_sq = torch.zeros(3)
    count = 0
    mean, std = torch.zeros(3), torch.ones(3)
    for i in range(4):
        x = rng.normal(size=(2, 5, 3)).astype(np.float32) * (i + 1)
        out, state = B.normalizer_apply(state, jnp.asarray(x), update=True)
        t = torch.from_numpy(x)
        count += t.shape[0]
        acc += t.mean(dim=(0, 1))
        acc_sq += (t**2).mean(dim=(0, 1))
        mean = acc / (count + 1e-8)
        std = torch.sqrt(acc_sq / (count + 1e-8) - mean**2)
        ref = (t - mean) / (std + 1e-8)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    # eval mode: stats frozen
    x = rng.normal(size=(2, 5, 3)).astype(np.float32)
    out, state2 = B.normalizer_apply(state, jnp.asarray(x), update=False)
    np.testing.assert_allclose(
        np.asarray(out), ((torch.from_numpy(x) - mean) / (std + 1e-8)).numpy(), atol=1e-5
    )
    inv = B.normalizer_inverse(state, out)
    np.testing.assert_allclose(np.asarray(inv), x, atol=1e-5)


def test_gru_matches_torch(rng):
    tg = torch.nn.GRU(input_size=6, hidden_size=8, batch_first=True)
    p = gru_init(jax.random.PRNGKey(0), 6, 8)
    p["w_ih"] = jnp.asarray(tg.weight_ih_l0.detach().numpy().T)
    p["w_hh"] = jnp.asarray(tg.weight_hh_l0.detach().numpy().T)
    p["b_ih"] = jnp.asarray(tg.bias_ih_l0.detach().numpy())
    p["b_hh"] = jnp.asarray(tg.bias_hh_l0.detach().numpy())
    x = rng.normal(size=(3, 7, 6)).astype(np.float32)
    ours = gru_scan(p, jnp.asarray(x), 8)
    ref, _ = tg(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


def test_mha_matches_torch(rng):
    E, H = 16, 4
    tm = torch.nn.MultiheadAttention(embed_dim=E, num_heads=H, batch_first=True)
    p = mha_init(jax.random.PRNGKey(0), E)
    p["in_w"] = jnp.asarray(tm.in_proj_weight.detach().numpy().T)
    p["in_b"] = jnp.asarray(tm.in_proj_bias.detach().numpy())
    p["out"] = {
        "w": jnp.asarray(tm.out_proj.weight.detach().numpy().T),
        "b": jnp.asarray(tm.out_proj.bias.detach().numpy()),
    }
    x = rng.normal(size=(2, 5, E)).astype(np.float32)
    mask = rng.random((2, 5, 5)) < 0.2
    np.fill_diagonal(mask[0], False)
    np.fill_diagonal(mask[1], False)
    ours = mha_apply(p, jnp.asarray(x), jnp.asarray(mask), H)
    tmask = torch.from_numpy(np.repeat(mask, H, axis=0))
    ref, _ = tm(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                attn_mask=tmask)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


def test_mgn_forward_and_training_step():
    batch = graph_batch()
    params, norm = mgn_init(jax.random.PRNGKey(0), state_size=4, n_processor=3)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, norm, opt_state, rng):
        def loss_fn(p):
            sh, oh, tgt, new_norm = mgn_apply(
                p, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
                batch["state"], batch["node_type"], train=True,
                apply_noise=False,
            )
            return mgn_loss(oh, tgt, batch["mask"]), (sh, new_norm)

        (loss, (sh, new_norm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_norm, opt_state, loss, sh

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(10):
        rng, sk = jax.random.split(rng)
        params, norm, opt_state, loss, sh = step(params, norm, opt_state, sk)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert sh.shape == batch["state"].shape
    # normalizer stats keep drifting, so compare averaged windows
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert float(norm["output"]["count"]) > 0


def test_gat_forward():
    batch = graph_batch()
    params, norm = gat_init(jax.random.PRNGKey(0), state_size=4, n_processor=2)
    sh, oh, tgt, _ = gat_apply(
        params, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
        batch["state"], batch["node_type"], train=True,
    )
    assert sh.shape == batch["state"].shape
    assert np.isfinite(np.asarray(sh)).all()


def test_graphvit_forward_and_loss():
    batch = graph_batch(n_cluster=10)
    params = graphvit_init(jax.random.PRNGKey(0), state_size=4, w_size=32,
                           n_attention=2, nb_gn=2, n_heads=4)
    sh, oh, tgt = graphvit_apply(
        params, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
        batch["state"], batch["node_type"], batch["cluster"],
        batch["cluster_mask"],
    )
    assert sh.shape == batch["state"].shape
    assert np.isfinite(np.asarray(sh)).all()
    loss = graphvit_loss(oh, tgt, batch["mask"])
    assert np.isfinite(float(loss))


def test_dilresnet_forward_and_loss(rng):
    params = dilresnet_init(jax.random.PRNGKey(0), channels=3, n_block=2, hidden=8)
    state = jnp.asarray(rng.normal(size=(2, 4, 24, 16, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 4, 24, 16)) < 0.2)
    sh, delta, target = dilresnet_apply(params, state, mask)
    assert sh.shape == state.shape
    assert delta.shape == (2, 3, 24, 16, 3)
    assert np.isfinite(float(dilresnet_loss(delta, target)))
    # BC forcing: masked pixels equal ground truth
    m = np.asarray(mask[:, 1:])
    np.testing.assert_allclose(
        np.asarray(sh[:, 1:])[m], np.asarray(state[:, 1:])[m], atol=1e-6
    )


def test_constrained_kmeans_constraints(rng):
    pts = rng.normal(size=(83, 2))
    cap = 10
    clusters = constrained_kmeans(pts, cap, seed=0)
    members = clusters[clusters >= 0]
    # every point in exactly one cluster
    assert sorted(members.tolist()) == list(range(83))
    # capacity respected
    assert clusters.shape[1] == cap
    assert ((clusters >= 0).sum(axis=1) <= cap).all()


def test_eagle_nrmse_zero_for_identical():
    from fluid_llm_tpu.data.synthetic import analytic_flow, make_cylinder_mesh
    from fluid_llm_tpu.train.eagle_eval import get_nrmse

    pos, faces = make_cylinder_mesh(3, 16, 8)
    states = analytic_flow(pos, 6, 3).transpose(0, 2, 1)[None]  # (1, T, N, 3)
    nrmse = get_nrmse(states, states, pos, faces, resolution=48)
    assert nrmse.shape == (1, 6)
    np.testing.assert_allclose(nrmse, 0.0, atol=1e-6)
    nrmse2 = get_nrmse(states, states * 1.1, pos, faces, resolution=48)
    assert (nrmse2 > 0).all()


def test_gatnet_forward(rng):
    from fluid_llm_tpu.models.baselines.gatnet import GATNetConfig, gatnet_apply, gatnet_init

    cfg = GATNetConfig(gnn_layers=3, gnn_dim=8, gnn_heads=2, mlp_hid_dim=16)
    params = gatnet_init(jax.random.PRNGKey(0), vertex_dim=5, edge_dim=3, out_dim=4, cfg=cfg)
    B, N, E = 2, 12, 30
    V = jnp.asarray(rng.normal(size=(B, N, 5)).astype(np.float32))
    Ef = jnp.asarray(rng.normal(size=(B, E, 3)).astype(np.float32))
    edges = jnp.asarray(rng.integers(0, N, size=(B, E, 2)))
    out = gatnet_apply(params, V, Ef, edges, out_dim=4, cfg=cfg)
    assert out.shape == (B, N, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_eagle_mgn_dataset_pkl_end_to_end(tmp_path, rng):
    """Real-format pkl -> EagleMGNDataset -> collate -> MGN forward."""
    import pickle

    from fluid_llm_tpu.data.eagle_mesh import EagleMGNDataset, iterate_graph_batches
    from fluid_llm_tpu.data.synthetic import analytic_flow, make_cylinder_mesh

    d = tmp_path / "train"
    d.mkdir()
    for i in range(2):
        pos, faces = make_cylinder_mesh(60 + i, 14, 8)
        states = analytic_flow(pos, 130, 60 + i)
        node_type = np.zeros((len(pos), 1), np.int64)
        node_type[pos[:, 0] <= pos[:, 0].min()] = 4
        data = {
            "mesh_pos": pos.astype(np.float32),
            "cells": faces,
            "node_type": node_type,
            "velocity": states[:, :2].transpose(0, 2, 1),
            "pressure": states[:, 2:].transpose(0, 2, 1),
        }
        with open(d / f"save_{i}.pkl", "wb") as f:
            pickle.dump(data, f)

    ds = EagleMGNDataset(str(tmp_path), mode="train", window_length=3,
                         normalize=False, max_steps=130)
    sample = ds[0]
    assert sample.state.shape[-1] == 4  # [Vx, Vy, P, P]
    assert sample.node_type.shape[-1] == 9

    batch = next(iterate_graph_batches(ds, 2, shuffle=False))
    params, norm = mgn_init(jax.random.PRNGKey(0), state_size=4, n_processor=2)
    sh, oh, tgt, _ = mgn_apply(
        params, norm,
        jnp.asarray(batch["mesh_pos"]), jnp.asarray(batch["edges"], jnp.int32),
        jnp.asarray(batch["state"]), jnp.asarray(batch["node_type"]),
        train=False,
    )
    assert np.isfinite(np.asarray(sh)).all()


def test_eagle_drone_dataset_npz(tmp_path, rng):
    """EAGLE npz layout (sim.npz + triangles.npy) -> GraphSample -> model."""
    from fluid_llm_tpu.data.eagle_mesh import EagleDroneDataset, collate_graphs
    from fluid_llm_tpu.data.synthetic import analytic_flow, make_cylinder_mesh

    pos, faces = make_cylinder_mesh(77, 12, 7)
    T = 990
    states = analytic_flow(pos, T, 77)  # (T, 3, N)
    sim_dir = tmp_path / "traj_0"
    sim_dir.mkdir()
    np.savez(
        sim_dir / "sim.npz",
        pointcloud=np.repeat(pos[None], T, 0).astype(np.float32),
        VX=states[:, 0], VY=states[:, 1],
        PS=states[:, 2], PG=states[:, 2] * 0.5,
        mask=np.zeros((T, len(pos), 1), np.int64),
    )
    np.save(sim_dir / "triangles.npy", np.repeat(faces[None], T, 0))

    ds = EagleDroneDataset(str(tmp_path), mode="valid", window_length=4, normalize=True)
    assert len(ds) == 1
    s = ds[0]
    assert s.state.shape == (4, len(pos), 4)
    assert s.mesh_pos.shape == (4, len(pos), 2)
    assert np.isfinite(s.state).all()

    batch = collate_graphs([s], s.mesh_pos.shape[1], s.edges.shape[0], 1, 1)
    params, norm = mgn_init(jax.random.PRNGKey(0), 4, 2)
    sh, _, _, _ = mgn_apply(
        params, norm, jnp.asarray(batch["mesh_pos"]),
        jnp.asarray(batch["edges"], jnp.int32), jnp.asarray(batch["state"]),
        jnp.asarray(batch["node_type"]), train=False,
    )
    assert np.isfinite(np.asarray(sh)).all()


def test_eagle_drone_split_file(tmp_path):
    """EAGLE Splits/<mode>.txt lists are honoured when present."""
    from fluid_llm_tpu.data.eagle_mesh import EagleDroneDataset

    # two trajectories, split file selecting only the second
    import numpy as np2

    from fluid_llm_tpu.data.synthetic import analytic_flow, make_cylinder_mesh

    for name in ("a", "b"):
        pos, faces = make_cylinder_mesh(5, 8, 5)
        states = analytic_flow(pos, 990, 5)
        d = tmp_path / name
        d.mkdir()
        np2.savez(d / "sim.npz", pointcloud=np2.repeat(pos[None], 990, 0),
                  VX=states[:, 0], VY=states[:, 1], PS=states[:, 2],
                  PG=states[:, 2], mask=np2.zeros((990, len(pos), 1), np2.int64))
        np2.save(d / "triangles.npy", np2.repeat(faces[None], 990, 0))
    (tmp_path / "Splits").mkdir()
    (tmp_path / "Splits" / "valid.txt").write_text("b\n")

    ds = EagleDroneDataset(str(tmp_path), mode="valid", window_length=3)
    assert len(ds) == 1
    assert ds.dataloc[0].endswith("b")


def _write_graph_pkls(d, n_files=2, n_steps=130, x_scale=1.0):
    import pickle

    from fluid_llm_tpu.data.synthetic import analytic_flow, make_cylinder_mesh

    d.mkdir(parents=True, exist_ok=True)
    for i in range(n_files):
        pos, faces = make_cylinder_mesh(60 + i, 14 + 2 * i, 8)
        pos = pos * np.array([x_scale, 1.0])
        states = analytic_flow(pos, n_steps, 60 + i)
        node_type = np.zeros((len(pos), 1), np.int64)
        data = {
            "mesh_pos": pos.astype(np.float32),
            "cells": faces,
            "node_type": node_type,
            "velocity": states[:, :2].transpose(0, 2, 1),
            "pressure": states[:, 2:].transpose(0, 2, 1),
        }
        with open(d / f"save_{i}.pkl", "wb") as f:
            pickle.dump(data, f)


def test_airfoil_graph_dataset_crop_and_norm(tmp_path):
    """AirfoilGraphDataset: spatial crop + the reference's airfoil constants
    (``eagle/Dataloader/airfoil.py:78-90,146-168``)."""
    from fluid_llm_tpu.data.eagle_mesh import (
        AIRFOIL_G_PRESSURE_MEAN, AIRFOIL_G_PRESSURE_STD,
        AIRFOIL_G_VELOCITY_MEAN, AIRFOIL_G_VELOCITY_STD,
        AirfoilGraphDataset, EagleMGNDataset,
    )

    # x scaled to [0, 3.2]: nodes beyond x=2 must be cropped away
    _write_graph_pkls(tmp_path / "train", x_scale=2.0)
    raw = EagleMGNDataset(str(tmp_path), mode="train", window_length=3,
                          normalize=False, max_steps=130)
    ds = AirfoilGraphDataset(str(tmp_path), mode="train", window_length=3,
                             normalize=False, max_steps=130)
    s_raw, s = raw[0], ds[0]
    assert s.mesh_pos.shape[1] < s_raw.mesh_pos.shape[1]
    assert (s.mesh_pos[0, :, 0] > -0.5).all() and (s.mesh_pos[0, :, 0] < 2.0).all()
    assert (s.mesh_pos[0, :, 1] > -0.75).all() and (s.mesh_pos[0, :, 1] < 0.75).all()
    # faces reindexed into the cropped node range
    assert s.faces.min() >= 0 and s.faces.max() < s.mesh_pos.shape[1]
    assert s.edges.max() < s.mesh_pos.shape[1]

    # normalization round-trip with the exact reference constants
    dsn = AirfoilGraphDataset(str(tmp_path), mode="train", window_length=3,
                              normalize=True, max_steps=130)
    sn = dsn[0]
    vel = sn.state[..., :2] * AIRFOIL_G_VELOCITY_STD + AIRFOIL_G_VELOCITY_MEAN
    press = sn.state[..., 2:] * AIRFOIL_G_PRESSURE_STD + AIRFOIL_G_PRESSURE_MEAN
    # the un-normalized dataset (same windows: same fixed rng construction)
    ds2 = AirfoilGraphDataset(str(tmp_path), mode="train", window_length=3,
                              normalize=False, max_steps=130)
    s2 = ds2[0]
    np.testing.assert_allclose(vel, s2.state[..., :2], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(press, s2.state[..., 2:], rtol=1e-4, atol=2e-1)


def test_static_buckets_one_shape_per_epoch(tmp_path):
    """Dataset-wide buckets: every batch of every epoch collates to the SAME
    shapes (single XLA compile), and the scan result is disk-cached."""
    import os

    from fluid_llm_tpu.data.eagle_mesh import EagleMGNDataset, iterate_graph_batches

    _write_graph_pkls(tmp_path / "train", n_files=5)
    ds = EagleMGNDataset(str(tmp_path), mode="train", window_length=3,
                         normalize=False, max_steps=130)

    shapes = set()
    for epoch in range(2):
        for batch in iterate_graph_batches(ds, 2, shuffle=True, seed=epoch):
            shapes.add(tuple((k, v.shape) for k, v in sorted(batch.items())
                             if not k.startswith("_")))
    # batch-size 2 over 5 files -> a trailing batch of 1; node/edge/cluster
    # dims must be constant, so exactly two shape signatures (B=2 and B=1)
    n_dims = {dict(sig)["state"][2] for sig in shapes}
    e_dims = {dict(sig)["edges"][2] for sig in shapes}
    assert len(n_dims) == 1 and len(e_dims) == 1
    assert len(shapes) == 2
    caches = [f for f in os.listdir(tmp_path / "train") if f.startswith(".fluid_buckets")]
    assert len(caches) == 1

    # cache is honoured on a fresh dataset (no rescan divergence)
    ds2 = EagleMGNDataset(str(tmp_path), mode="train", window_length=3,
                          normalize=False, max_steps=130)
    b2 = next(iterate_graph_batches(ds2, 2, shuffle=False))
    assert dict(tuple(sorted((k, v.shape) for k, v in b2.items()
                             if not k.startswith("_"))))["state"][2] in n_dims


def _reordered_batch(n_cluster=0, n_traj=2, window=3):
    from fluid_llm_tpu.data.eagle_mesh import static_bucket_sizes
    from fluid_llm_tpu.data.reorder import reorder_sample

    ds = SyntheticGraphDataset(n_trajectories=n_traj, window_length=window,
                               n_cluster=n_cluster, mode="valid")
    n, e, c, k = static_bucket_sizes(ds)
    samples = [reorder_sample(ds[i]) for i in range(n_traj)]
    batch = collate_graphs(samples, n, e, c, ghost_type_value=2, k_max=k)
    flags = (batch.pop("_rev_window"), batch.pop("_cluster_window"))
    return {kk: jnp.asarray(v) for kk, v in batch.items()}, flags


def test_mgn_windowed_reverse_edges_parity(monkeypatch):
    """rev_window (Pallas kernels for edges[..., 1]) == XLA path on the
    same reordered batch: outputs AND grads (VERDICT r4 #2)."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    batch, (rev_w, _) = _reordered_batch()
    assert rev_w > 0
    params, norm = mgn_init(jax.random.PRNGKey(0), state_size=4, n_processor=2)

    def run(rw):
        sh, oh, tgt, _ = mgn_apply(
            params, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
            batch["state"], batch["node_type"], train=True, rev_window=rw,
        )
        return sh, oh, tgt

    sh_k, oh_k, tgt_k = run(rev_w)
    sh_x, oh_x, tgt_x = run(0)
    np.testing.assert_allclose(np.asarray(sh_k), np.asarray(sh_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(oh_k), np.asarray(oh_x), atol=2e-5)

    def loss(p, rw):
        _, oh, tgt, _ = mgn_apply(
            p, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
            batch["state"], batch["node_type"], train=True, rev_window=rw,
        )
        return mgn_loss(oh, tgt, batch["mask"])

    gk = jax.grad(lambda p: loss(p, rev_w))(params)
    gx = jax.grad(lambda p: loss(p, 0))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-5, rtol=5e-4),
        gk, gx)


def test_graphvit_windowed_cluster_parity(monkeypatch):
    """cluster_window (Pallas kernels for the cluster gathers/scatters)
    matches the reference-shaped XLA path on REAL nodes; the ghost node
    row is the documented zero-vs-garbage divergence (loss-masked)."""
    monkeypatch.setenv("FLUID_SEGSUM", "interpret")
    batch, (rev_w, cl_w) = _reordered_batch(n_cluster=6)
    assert rev_w > 0 and cl_w > 0
    params = graphvit_init(jax.random.PRNGKey(0), state_size=4, w_size=32,
                           n_attention=2, nb_gn=2, n_heads=4)

    def run(rw, cw):
        return graphvit_apply(
            params, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
            batch["state"], batch["node_type"], batch["cluster"],
            batch["cluster_mask"], rev_window=rw, cluster_window=cw,
        )

    sh_k, oh_k, tgt_k = run(rev_w, cl_w)
    sh_x, oh_x, tgt_x = run(0, 0)
    m = np.asarray(batch["mask"]) > 0  # real nodes only (ghost row differs)
    np.testing.assert_allclose(np.asarray(sh_k)[m], np.asarray(sh_x)[m],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(oh_k)[m[:, 1:]],
                               np.asarray(oh_x)[m[:, 1:]], atol=2e-5)

    def loss(p, rw, cw):
        _, oh, tgt = graphvit_apply(
            p, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
            batch["state"], batch["node_type"], batch["cluster"],
            batch["cluster_mask"], rev_window=rw, cluster_window=cw,
        )
        return graphvit_loss(oh, tgt, batch["mask"])

    gk = jax.grad(lambda p: loss(p, rev_w, cl_w))(params)
    gx = jax.grad(lambda p: loss(p, 0, 0))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4, rtol=1e-3),
        gk, gx)
