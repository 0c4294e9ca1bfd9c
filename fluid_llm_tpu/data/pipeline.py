"""Shared dataset pipeline: window -> grid -> pad -> patch -> normalize.

Reproduces the sample layout of ``MGNDataset.ds_get``
(``src/dataloader/simple_dataloader.py:72-102``): each sample is

    (input_states, next_state, diffs, bc_mask, position_ids)

with patch tensors ``(seq_len-1, N_patch, 3, px, py)`` and position ids
``(seq_len-1, N_patch, 3)``.  The mesh->grid interpolation constants are
precomputed per trajectory (``core/triangulation.py``); the per-window
resample + patchify runs as one jitted function.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.core.interp import resample_to_grid
from fluid_llm_tpu.data.ds_props import DSProps
from fluid_llm_tpu.ops.patching import num_patches


def pad_amounts(h: int, w: int, patch: tuple[int, int]) -> tuple[tuple[int, int], tuple[int, int]]:
    """Centered pad-to-patch-multiple (``simple_dataloader.py:137-152``)."""
    pw = -h % patch[0]
    ph = -w % patch[1]
    return (pw // 2, pw - pw // 2), (ph // 2, ph - ph // 2)


@partial(jax.jit, static_argnames=("patch", "pad_x", "pad_y", "flip_y", "trim", "masked_norm"))
def window_to_patches(
    grid_states: jnp.ndarray,
    grid_mask: jnp.ndarray,
    means: jnp.ndarray,
    stds: jnp.ndarray,
    *,
    patch: tuple[int, int],
    pad_x: tuple[int, int],
    pad_y: tuple[int, int],
    flip_y: bool = False,
    trim: bool = False,
    masked_norm: bool = False,
):
    """(seq, 3, H, W) grid window -> reference sample tuple (jitted).

    grid_mask: (H, W) bool (True outside mesh).  Padding pixels get mask=1
    and state=0 (``simple_dataloader.py:137-152``); normalization uses fixed
    per-dataset stats (``:193-216``).

    Airfoil-protocol options (``src/dataloader/airfoil_ds.py``):
      flip_y:      mirror the y axis (``:80``),
      trim:        drop the outer ring of patches (``:133``, so the patch
                   count is ``num_patches - 2`` per axis, ``:54``),
      masked_norm: normalize only inside-mesh pixels (``:216-244``) —
                   masked/padded pixels stay exactly 0.
    """
    seq = grid_states.shape[0]
    px, py = patch

    states = jnp.pad(grid_states, ((0, 0), (0, 0), pad_x, pad_y))
    mask = jnp.pad(grid_mask, (pad_x, pad_y), constant_values=True)

    if flip_y:
        states = states[:, :, :, ::-1]
        mask = mask[:, ::-1]
    if trim:
        states = states[:, :, px:-px, py:-py]
        mask = mask[px:-px, py:-py]

    H, W = states.shape[-2:]
    nx, ny = H // px, W // py

    # normalize (fixed stats) before diffs, as the reference does; the
    # normalization commutes with patchify so applying it on the grid here
    # is value-identical to the reference's post-patch application
    normed = (states - means[None, :, None, None]) / stds[None, :, None, None]
    if masked_norm:
        states = jnp.where(mask[None, None], states, normed)
    else:
        states = normed

    # patchify: (seq, 3, H, W) -> (seq, N_patch, 3, px, py)
    s = states.reshape(seq, 3, nx, px, ny, py)
    s = jnp.transpose(s, (0, 2, 4, 1, 3, 5)).reshape(seq, nx * ny, 3, px, py)
    m = mask.reshape(nx, px, ny, py)
    m = jnp.transpose(m, (0, 2, 1, 3)).reshape(nx * ny, px, py)

    input_states = s[:-1]
    next_state = s[1:]
    diffs = s[1:] - s[:-1]
    bc_mask = jnp.broadcast_to(m[None, :, None], (seq - 1, nx * ny, 3, px, py))
    return input_states, next_state, diffs, bc_mask


def position_ids(
    seq_len_m1: int, nx_patch: int, ny_patch: int, t_base: int = 0, t_step: int = 1
) -> np.ndarray:
    """``simple_dataloader.py:218-226`` — reproduced exactly, including the
    quirky x-fastest labelling that doesn't match the y-fastest patch order
    (harmless: the embeddings are learned per index).

    ``t_base``/``t_step``: (0, 1) reproduces the reference's window-relative
    ids; the absolute-time variant (``Config.absolute_time_ids``, for
    streaming-served rope models) passes the window's trajectory step and
    ``seq_interval`` so every frame is labelled with its RAW trajectory step
    — the same physical state always gets the same t, whatever window or
    stride sampled it."""
    n_patch = nx_patch * ny_patch
    arange = np.arange(seq_len_m1 * n_patch)
    x_idx = arange % nx_patch
    y_idx = (arange // nx_patch) % ny_patch
    t_idx = (arange // n_patch) * t_step + t_base
    return np.stack([x_idx, y_idx, t_idx], axis=1).reshape(seq_len_m1, n_patch, 3).astype(np.int32)


@dataclass
class TrajectorySource:
    """Precomputed per-trajectory resampling data + node states access."""

    vert_idx: np.ndarray
    weights: np.ndarray
    mask: np.ndarray
    # node_states: (n_steps, 3, N_nodes) float32 (Vx, Vy, P per node)
    node_states: np.ndarray


class PatchDataset:
    """Common driver for cylinder-protocol datasets.

    Subclasses provide trajectories; this class handles window selection
    (random step in train, fixed step 100 for val/test,
    ``simple_dataloader.py:67-69``), the jitted resample+patch pipeline and
    position ids.
    """

    # airfoil-protocol switches (see ``window_to_patches``)
    flip_y: bool = False
    trim_patches: bool = False
    masked_norm: bool = False

    def __init__(
        self,
        resolution: int,
        patch_size: tuple[int, int],
        seq_len: int,
        seq_interval: int = 1,
        mode: str = "train",
        normalize: bool = True,
        means: Sequence[float] = (0.0, 0.0, 0.0),
        stds: Sequence[float] = (1.0, 1.0, 1.0),
        max_steps: int = 600,
        seed: int = 1234,
        absolute_time: bool = False,
    ):
        assert mode in ("train", "valid", "test")
        self.mode = mode
        self.absolute_time = absolute_time
        self.resolution = resolution
        self.patch_size = tuple(patch_size)
        self.seq_len = seq_len
        self.seq_interval = seq_interval
        self.max_step_num = max_steps - seq_len * seq_interval
        self.normalize = normalize
        self.means = np.asarray(means, np.float32) if normalize else np.zeros(3, np.float32)
        self.stds = np.asarray(stds, np.float32) if normalize else np.ones(3, np.float32)
        self._rng = np.random.default_rng(seed)
        self._geom: Optional[tuple] = None  # (pad_x, pad_y, Nx, Ny) probed lazily

    # -- subclass API -------------------------------------------------------

    def num_trajectories(self) -> int:
        raise NotImplementedError

    def get_trajectory(self, idx: int) -> TrajectorySource:
        raise NotImplementedError

    # -- geometry -----------------------------------------------------------

    def _probe(self):
        if self._geom is None:
            src = self.get_trajectory(min(1, self.num_trajectories() - 1))
            h, w = src.mask.shape
            pad_x, pad_y = pad_amounts(h, w, self.patch_size)
            nx = num_patches(h + sum(pad_x), self.patch_size[0], self.patch_size[0])
            ny = num_patches(w + sum(pad_y), self.patch_size[1], self.patch_size[1])
            if self.trim_patches:  # outer ring dropped (``airfoil_ds.py:54``)
                nx, ny = nx - 2, ny - 2
            self._geom = (pad_x, pad_y, nx, ny)
        return self._geom

    @property
    def N_x_patch(self) -> int:
        return self._probe()[2]

    @property
    def N_y_patch(self) -> int:
        return self._probe()[3]

    @property
    def N_patch(self) -> int:
        return self.N_x_patch * self.N_y_patch

    def ds_props(self) -> DSProps:
        return DSProps(
            Nx_patch=self.N_x_patch,
            Ny_patch=self.N_y_patch,
            patch_size=self.patch_size,
            seq_len=self.seq_len - 1,
        )

    # -- samples ------------------------------------------------------------

    def __len__(self) -> int:
        return self.num_trajectories()

    def sample(self, idx: int, step_num: Optional[int] = None):
        if step_num is None:
            step_num = (
                100
                if self.mode in ("valid", "test")
                else int(self._rng.integers(0, self.max_step_num + 1))
            )
        src = self.get_trajectory(idx)
        pad_x, pad_y, nx, ny = self._probe()

        steps = np.arange(
            step_num, step_num + self.seq_len * self.seq_interval, self.seq_interval
        )
        node_states = src.node_states[steps]  # (seq, 3, N_nodes)
        grid = resample_to_grid(
            jnp.asarray(node_states), jnp.asarray(src.vert_idx),
            jnp.asarray(src.weights), jnp.asarray(src.mask),
        )
        input_states, next_state, diffs, bc_mask = window_to_patches(
            grid, jnp.asarray(src.mask), jnp.asarray(self.means), jnp.asarray(self.stds),
            patch=self.patch_size, pad_x=pad_x, pad_y=pad_y,
            flip_y=self.flip_y, trim=self.trim_patches, masked_norm=self.masked_norm,
        )
        pos = position_ids(
            self.seq_len - 1, nx, ny,
            t_base=step_num if self.absolute_time else 0,
            t_step=self.seq_interval if self.absolute_time else 1,
        )
        return input_states, next_state, diffs, bc_mask, pos

    def __getitem__(self, idx: int):
        return self.sample(idx)


def make_batches(
    dataset: PatchDataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int = 0,
    drop_last: bool = False,
    num_workers: int = 0,
    prefetch: int = 2,
) -> Iterator[tuple]:
    """Host batcher with optional threaded prefetch.

    The reference uses torch ``DataLoader(num_workers=6, prefetch_factor=2)``
    (``src/utils_model.py:34-39``); here worker *threads* build samples (the
    heavy lifting — mesh resample + patchify — is jitted device work that
    releases the GIL) and ``prefetch`` batches are staged ahead of the
    consumer.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    chunks = [
        order[i:i + batch_size]
        for i in range(0, len(order), batch_size)
        if not (drop_last and len(order[i:i + batch_size]) < batch_size)
    ]

    def build(chunk):
        samples = [dataset[int(j)] for j in chunk]
        return tuple(jnp.stack([s[k] for s in samples]) for k in range(5))

    if num_workers <= 0:
        for chunk in chunks:
            yield build(chunk)
        return

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending = []
        it = iter(chunks)
        for _ in range(max(1, prefetch)):
            chunk = next(it, None)
            if chunk is not None:
                pending.append(pool.submit(build, chunk))
        while pending:
            fut = pending.pop(0)
            chunk = next(it, None)
            if chunk is not None:
                pending.append(pool.submit(build, chunk))
            yield fut.result()
