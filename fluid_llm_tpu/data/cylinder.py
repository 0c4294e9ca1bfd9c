"""Cylinder-flow dataset over DeepMind MGN pickles.

Equivalent of ``MGNDataset`` (``src/dataloader/simple_dataloader.py:23-229``):
each ``.pkl`` holds ``{'cells', 'mesh_pos', 'velocity', 'pressure', ...}``
(written by the converters in ``tools/convert_mgn.py``; format per
``max/ds_download/MGN_unload.py:84-99``).  Interpolation constants are built
once per trajectory and cached; fixed normalization stats are the exact
cylinder constants (``simple_dataloader.py:205-210``).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from fluid_llm_tpu.core.triangulation import get_mesh_interpolation
from fluid_llm_tpu.data.pipeline import PatchDataset, TrajectorySource

# parity-critical constants (``simple_dataloader.py:205-210``)
CYLINDER_MEANS = (0.823, 0.0005865, 0.04763)
CYLINDER_STDS = (0.275, 0.275, 0.275)


class MGNDataset(PatchDataset):
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
            means=CYLINDER_MEANS,
            stds=CYLINDER_STDS,
            max_steps=600,  # ``simple_dataloader.py:40``
            seed=seed,
            absolute_time=absolute_time,
        )
        self.load_dir = load_dir
        self.save_files = sorted(f for f in os.listdir(load_dir) if f.endswith(".pkl"))
        if not self.save_files:
            raise FileNotFoundError(f"No .pkl trajectories in {load_dir}")
        self.max_cache = max_cache
        self._cache: dict[int, TrajectorySource] = {}

    def num_trajectories(self) -> int:
        return len(self.save_files)

    def _load_raw(self, idx: int) -> dict:
        with open(os.path.join(self.load_dir, self.save_files[idx]), "rb") as f:
            return pickle.load(f)

    def get_trajectory(self, idx: int) -> TrajectorySource:
        if idx not in self._cache:
            if len(self._cache) >= self.max_cache:
                self._cache.pop(next(iter(self._cache)))
            data = self._load_raw(idx)
            pos = np.asarray(data["mesh_pos"], np.float64)
            faces = np.asarray(data["cells"], np.int32)
            interp = get_mesh_interpolation(pos, faces, self.resolution)
            vel = np.asarray(data["velocity"], np.float32)  # (T, N, 2)
            press = np.asarray(data["pressure"], np.float32)  # (T, N, 1)
            states = np.concatenate([vel, press], axis=-1)  # (T, N, 3)
            states = np.transpose(states, (0, 2, 1))  # (T, 3, N)
            self._cache[idx] = TrajectorySource(
                vert_idx=interp.vert_idx,
                weights=interp.weights,
                mask=interp.mask,
                node_states=np.ascontiguousarray(states),
            )
        return self._cache[idx]
