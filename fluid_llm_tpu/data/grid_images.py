"""Grid-image datasets for DilResNet (on-the-fly mesh->grid windows).

Equivalents of ``eagle/Dataloader/IMG_MGN.py`` (cylinder/airfoil pkl
trajectories resampled to the 238-grid per window, airfoil crop of the outer
16px ring, per-dataset fixed normalization ``IMG_MGN.py:141-157``) and the
pre-rendered-image EAGLE loader (``IMG_Eagle.py``).  The per-window resample
rides the jitted gather op of ``core/interp.py``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.core.interp import resample_to_grid
from fluid_llm_tpu.data.pipeline import PatchDataset, TrajectorySource

CYL_MEANS, CYL_STDS = (0.823, 0.0005865, 0.04763), (0.275, 0.275, 0.275)
AIR_MEANS, AIR_STDS = (170.1, -1.183, 9.935e4), (71.06, 46.73, 8964.0)


class GridImageDataset:
    """Wraps a :class:`PatchDataset`-style trajectory source and yields raw
    grid windows ``(T, H, W, 3)`` + boundary mask ``(T, H, W)``."""

    def __init__(
        self,
        source: PatchDataset,
        window_length: int = 6,
        mode: str = "train",
        means=CYL_MEANS,
        stds=CYL_STDS,
        crop: int = 0,
        seed: int = 1234,
    ):
        self.source = source
        self.window_length = window_length
        self.mode = mode
        self.means = np.asarray(means, np.float32)
        self.stds = np.asarray(stds, np.float32)
        self.crop = crop
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return self.source.num_trajectories()

    def __getitem__(self, item: int):
        src = self.source.get_trajectory(item)
        max_start = src.node_states.shape[0] - self.window_length
        t = 100 if self.mode != "train" else int(self._rng.integers(0, max_start + 1))
        t = min(t, max_start)
        steps = np.arange(t, t + self.window_length)

        grid = resample_to_grid(
            jnp.asarray(src.node_states[steps]),
            jnp.asarray(src.vert_idx), jnp.asarray(src.weights), jnp.asarray(src.mask),
        )  # (T, 3, H, W)
        grid = np.asarray(grid)
        mask = np.broadcast_to(src.mask, (self.window_length,) + src.mask.shape)
        if self.crop:
            c = self.crop
            grid = grid[:, :, c:-c, c:-c]
            mask = mask[:, c:-c, c:-c]
        state = (grid - self.means[None, :, None, None]) / self.stds[None, :, None, None]
        return np.moveaxis(state, 1, -1), mask.copy()  # NHWC


class EagleImageDataset:
    """Pre-rendered EAGLE grid images (``eagle/Dataloader/IMG_Eagle.py``):
    per-trajectory ``states.npy`` (T, H, W, C) + ``pixel_type.npy`` mask;
    fixed val/test window start 550."""

    # EAGLE image normalization constants (``IMG_Eagle.py`` normalize)
    MEANS = (-0.0015, 0.2211, -0.8322)
    STDS = (1.7970, 2.0258, 7.4013)

    def __init__(self, data_path: str, mode: str = "train", window_length: int = 10, seed: int = 1):
        import os

        assert mode in ("train", "valid", "test")
        self.dataloc = sorted(
            os.path.join(r) for r, _, fs in os.walk(data_path) if "states.npy" in fs
        )
        if not self.dataloc:
            raise FileNotFoundError(f"No states.npy under {data_path}")
        self.mode = mode
        self.window_length = window_length
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.dataloc)

    def __getitem__(self, item: int):
        import os

        T = self.window_length
        t = 1 if T == 990 else int(self._rng.integers(1, 990 - T + 1))
        if self.mode in ("test", "valid") and T != 990:
            t = 550
        states = np.load(os.path.join(self.dataloc[item], "states.npy"), mmap_mode="r")
        mask = np.load(os.path.join(self.dataloc[item], "pixel_type.npy"), mmap_mode="r")
        window = np.asarray(states[t:t + T], np.float32)
        means = np.asarray(self.MEANS, np.float32)[: window.shape[-1]]
        stds = np.asarray(self.STDS, np.float32)[: window.shape[-1]]
        window = (window - means) / stds
        m = np.broadcast_to(np.asarray(mask, bool), (T,) + np.asarray(mask).shape[-2:])
        return window, m.copy()


def iterate_image_batches(
    dataset: GridImageDataset, batch_size: int, *, shuffle: bool, seed: int = 0
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        samples = [dataset[int(j)] for j in order[i:i + batch_size]]
        yield (
            np.stack([s[0] for s in samples]),
            np.stack([s[1] for s in samples]),
        )
