"""Airfoil dataset: cylinder protocol + crop / y-flip / trim / masked norm.

Equivalent of ``AirfoilDataset`` (``src/dataloader/airfoil_ds.py:23-257``):

- domain crop to x in (-0.5, 2), y in (-0.75, 0.75) with node and face
  re-indexing (``:158-187``),
- y-axis flip of the grid images (``:80``),
- outer ring of patches trimmed (``:133``, ``N_{x,y}_patch - 2`` ``:54``),
- *masked* normalization — only inside-mesh pixels are shifted/scaled
  (``:216-244``), with the exact airfoil constants.
"""

from __future__ import annotations

import os
import pickle
import re

import numpy as np

from fluid_llm_tpu.core.triangulation import get_mesh_interpolation
from fluid_llm_tpu.data.pipeline import PatchDataset, TrajectorySource

# parity-critical constants (``airfoil_ds.py:228-233``)
AIRFOIL_MEANS = (170.1, -1.183, 9.935e4)
AIRFOIL_STDS = (50.0, 50.0, 6197.0)

CROP_X = (-0.5, 2.0)
CROP_Y = (-0.75, 0.75)


def crop_mesh(pos: np.ndarray, faces: np.ndarray, fields: list[np.ndarray]):
    """Remove the outer region and re-index faces (``airfoil_ds.py:164-183``)."""
    keep = (
        (pos[:, 0] > CROP_X[0]) & (pos[:, 0] < CROP_X[1])
        & (pos[:, 1] > CROP_Y[0]) & (pos[:, 1] < CROP_Y[1])
    )
    new_index = np.zeros(len(keep), dtype=np.int64)
    new_index[keep] = np.arange(int(keep.sum()))
    face_keep = keep[faces].all(axis=1)
    new_faces = new_index[faces[face_keep]]
    return pos[keep], new_faces.astype(np.int32), [f[:, keep] for f in fields]


class AirfoilDataset(PatchDataset):
    flip_y = True
    trim_patches = True
    masked_norm = True

    def __init__(
        self,
        load_dir: str,
        resolution: int = 238,
        patch_size: tuple[int, int] = (16, 16),
        seq_len: int = 10,
        seq_interval: int = 1,
        mode: str = "train",
        normalize: bool = True,
        max_cache: int = 8,
        seed: int = 1234,
        absolute_time: bool = False,
    ):
        super().__init__(
            resolution=resolution,
            patch_size=patch_size,
            seq_len=seq_len,
            seq_interval=seq_interval,
            mode=mode,
            normalize=normalize,
            means=AIRFOIL_MEANS,
            stds=AIRFOIL_STDS,
            max_steps=600,
            seed=seed,
            absolute_time=absolute_time,
        )
        self.load_dir = load_dir
        # natsorted file list (``airfoil_ds.py:44``)
        self.save_files = sorted(
            (f for f in os.listdir(load_dir) if f.endswith(".pkl")),
            key=lambda s: [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", s)],
        )
        if not self.save_files:
            raise FileNotFoundError(f"No .pkl trajectories in {load_dir}")
        self.max_cache = max_cache
        self._cache: dict[int, TrajectorySource] = {}

    def num_trajectories(self) -> int:
        return len(self.save_files)

    def get_trajectory(self, idx: int) -> TrajectorySource:
        if idx not in self._cache:
            if len(self._cache) >= self.max_cache:
                self._cache.pop(next(iter(self._cache)))
            with open(os.path.join(self.load_dir, self.save_files[idx]), "rb") as f:
                data = pickle.load(f)
            pos = np.asarray(data["mesh_pos"], np.float64)
            faces = np.asarray(data["cells"], np.int64)
            vel = np.asarray(data["velocity"], np.float32)  # (T, N, 2)
            press = np.asarray(data["pressure"], np.float32)  # (T, N, 1)
            pos, faces, (vel, press) = crop_mesh(pos, faces, [vel, press])
            interp = get_mesh_interpolation(pos, faces, self.resolution)
            states = np.concatenate([vel, press], axis=-1).transpose(0, 2, 1)
            self._cache[idx] = TrajectorySource(
                vert_idx=interp.vert_idx,
                weights=interp.weights,
                mask=interp.mask,
                node_states=np.ascontiguousarray(states),
            )
        return self._cache[idx]
