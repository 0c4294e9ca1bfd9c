"""Dataset pipeline parity vs a torch/matplotlib oracle of the reference
``ds_get`` protocol (``src/dataloader/simple_dataloader.py:72-102`` and
``src/dataloader/airfoil_ds.py:71-103``)."""

import os
import pickle

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from matplotlib import tri as mtri

from fluid_llm_tpu.data.airfoil import AIRFOIL_MEANS, AIRFOIL_STDS, AirfoilDataset
from fluid_llm_tpu.data.cylinder import CYLINDER_MEANS, CYLINDER_STDS, MGNDataset
from fluid_llm_tpu.data.synthetic import (
    SyntheticCylinderDataset,
    analytic_flow,
    make_cylinder_mesh,
)


def oracle_grid_window(pos, faces, node_states, steps, resolution):
    """matplotlib path: interp each channel of each step, mask -> 0."""
    triang = mtri.Triangulation(pos[:, 0], pos[:, 1], triangles=faces)
    x_min, y_min = pos.min(axis=0)
    x_max, y_max = pos.max(axis=0)
    long_ax = max(x_max - x_min, y_max - y_min)
    ratio = min(x_max - x_min, y_max - y_min) / long_ax
    if x_max - x_min > y_max - y_min:
        xp, yp = resolution, int(resolution * ratio)
    else:
        yp, xp = resolution, int(resolution * ratio)
    gx, gy = np.mgrid[x_min:x_max:xp * 1j, y_min:y_max:yp * 1j]
    gx, gy = gx.astype(np.float32), gy.astype(np.float32)
    tri_index = triang.get_trifinder()(gx, gy)

    frames, mask = [], None
    for s in steps:
        chans = []
        for c in range(3):
            m = mtri.LinearTriInterpolator(triang, node_states[s, c])(gx, gy)
            data = m.data.copy()
            data[m.mask] = 0.0
            chans.append(data)
            mask = m.mask
        frames.append(np.stack(chans))
    return np.stack(frames).astype(np.float32), mask


def oracle_sample(grid, mask, patch, means, stds, flip=False, trim=False, masked_norm=False):
    """torch path: pad -> (flip/trim) -> unfold -> normalize -> diffs."""
    seq = grid.shape[0]
    ph, pw = patch
    h, w = grid.shape[-2:]
    pad_w, pad_h = -h % ph, -w % pw
    pads = ((pad_w // 2, pad_w - pad_w // 2), (pad_h // 2, pad_h - pad_h // 2))
    grid = np.pad(grid, ((0, 0), (0, 0), pads[0], pads[1]))
    mask = np.pad(mask, pads, constant_values=True)
    stacked = np.concatenate([grid, mask[None].repeat(seq, 0)[:, None]], axis=1)
    if flip:
        stacked = stacked[:, :, :, ::-1].copy()
    t = torch.from_numpy(stacked).float()
    if trim:
        t = t[:, :, ph:-ph, pw:-pw]
    patches = F.unfold(t, kernel_size=patch, stride=patch)
    patches = patches.view(seq, 4, ph, pw, -1)
    states = patches[:, :-1].permute(0, 4, 1, 2, 3)
    masks = patches[:, -1].permute(0, 3, 1, 2)

    means_t = torch.tensor(means).reshape(1, 1, 3, 1, 1)
    stds_t = torch.tensor(stds).reshape(1, 1, 3, 1, 1)
    if masked_norm:
        mm = masks.unsqueeze(2).repeat(1, 1, 3, 1, 1).bool()
        normed = (states - means_t) / stds_t
        states = torch.where(mm, states, normed)
    else:
        states = (states - means_t) / stds_t

    diffs = states[1:] - states[:-1]
    bc = masks[1:].unsqueeze(2).repeat(1, 1, 3, 1, 1).bool()
    return states[:-1].numpy(), states[1:].numpy(), diffs.numpy(), bc.numpy()


def test_synthetic_dataset_matches_oracle():
    ds = SyntheticCylinderDataset(n_trajectories=2, resolution=64, seq_len=4, mode="valid")
    s, ns, d, m, pos = ds.sample(0, step_num=100)

    p, faces = make_cylinder_mesh(ds.base_seed + 0, *ds.mesh_nodes)
    node_states = analytic_flow(p, ds.max_steps, ds.base_seed + 0)
    grid, mask = oracle_grid_window(p, faces, node_states, range(100, 104), 64)
    so, nso, do, mo = oracle_sample(
        grid, mask, ds.patch_size, [0.8, 0.0, 0.05], [0.275, 0.275, 0.275]
    )
    np.testing.assert_allclose(np.asarray(s), so, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d), do, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(m), mo)

    # pos ids: x fastest, then y, then t (``simple_dataloader.py:218-226``)
    n_patch = ds.N_patch
    assert pos.shape == (3, n_patch, 3)
    np.testing.assert_array_equal(pos[0, :, 0], np.arange(n_patch) % ds.N_x_patch)
    np.testing.assert_array_equal(pos[1, :, 2], np.ones(n_patch))


@pytest.fixture
def pkl_dir(tmp_path, rng):
    """Write synthetic trajectories in the reference .pkl layout
    (``max/ds_download/MGN_unload.py:84-99``)."""
    d = tmp_path / "train"
    d.mkdir()
    for i in range(2):
        pos, faces = make_cylinder_mesh(50 + i, 24, 10)
        states = analytic_flow(pos, 130, 50 + i)  # (T, 3, N)
        data = {
            "mesh_pos": pos.astype(np.float32),
            "cells": faces,
            "velocity": states[:, :2].transpose(0, 2, 1),  # (T, N, 2)
            "pressure": states[:, 2:].transpose(0, 2, 1),  # (T, N, 1)
            "density": np.ones_like(states[:, 2:]).transpose(0, 2, 1),
        }
        with open(d / f"save_{i}.pkl", "wb") as f:
            pickle.dump(data, f)
    return str(d)


def test_mgn_dataset_from_pkl(pkl_dir):
    ds = MGNDataset(pkl_dir, resolution=48, seq_len=4, mode="valid")
    s, ns, d, m, pos = ds.sample(0, step_num=20)
    assert s.shape[0] == 3 and s.shape[2:] == (3, 16, 16)
    assert np.isfinite(np.asarray(s)).all()
    # masked pixels normalize to (0-mean)/std (cylinder normalizes everything)
    mm = np.asarray(m)[0, :, 0]
    sv = np.asarray(s)[0, :, 0]
    expected = (0.0 - CYLINDER_MEANS[0]) / CYLINDER_STDS[0]
    np.testing.assert_allclose(sv[mm], expected, atol=1e-5)


def test_airfoil_dataset_from_pkl(tmp_path, rng):
    d = tmp_path / "valid"
    d.mkdir()
    # mesh spanning beyond the crop box so cropping actually bites
    pos, faces = make_cylinder_mesh(7, 30, 24)
    pos = pos * np.array([2.5, 5.0]) + np.array([-0.8, -1.0])  # x in (-.8,3.2), y in (-1,1.05)
    states = analytic_flow(pos, 130, 7)
    states = states * np.array([50.0, 50.0, 6000.0]).reshape(1, 3, 1) + np.array(
        [170.0, 0.0, 9.9e4]
    ).reshape(1, 3, 1)
    data = {
        "mesh_pos": pos.astype(np.float32),
        "cells": faces.astype(np.int64),
        "velocity": states[:, :2].transpose(0, 2, 1),
        "pressure": states[:, 2:].transpose(0, 2, 1),
        "density": np.ones((130, len(pos), 1), np.float32),
    }
    with open(d / "save_0.pkl", "wb") as f:
        pickle.dump(data, f)

    ds = AirfoilDataset(str(d), resolution=64, seq_len=3, mode="valid")
    s, ns, df, m, pos_ids = ds.sample(0, step_num=10)
    assert s.shape[0] == 2
    assert np.isfinite(np.asarray(s)).all()
    # masked pixels must be exactly 0 under masked normalization
    mm = np.asarray(m)[0]
    sv = np.asarray(s)[0]
    np.testing.assert_allclose(sv[mm], 0.0, atol=1e-6)

    # oracle comparison with crop/flip/trim/masked-norm
    from fluid_llm_tpu.data.airfoil import crop_mesh

    cpos, cfaces, (vel, press) = crop_mesh(
        data["mesh_pos"].astype(np.float64), np.asarray(data["cells"]),
        [data["velocity"], data["pressure"]],
    )
    node_states = np.concatenate([vel, press], axis=-1).transpose(0, 2, 1)
    grid, mask = oracle_grid_window(cpos, cfaces, node_states, range(10, 13), 64)
    so, nso, do, mo = oracle_sample(
        grid, mask, (16, 16), list(AIRFOIL_MEANS), list(AIRFOIL_STDS),
        flip=True, trim=True, masked_norm=True,
    )
    np.testing.assert_array_equal(np.asarray(m), mo)
    np.testing.assert_allclose(np.asarray(s), so, atol=2e-4)


def test_make_batches_threaded_matches_serial():
    from fluid_llm_tpu.data.pipeline import make_batches

    ds = SyntheticCylinderDataset(n_trajectories=5, resolution=32, seq_len=3, mode="valid")
    serial = list(make_batches(ds, 2, shuffle=True, seed=3))
    threaded = list(make_batches(ds, 2, shuffle=True, seed=3, num_workers=3))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
