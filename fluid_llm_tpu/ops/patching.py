"""Patch <-> image algebra as pure reshape/transpose.

The reference uses cuDNN ``F.unfold``/``F.fold`` (``src/utils_model.py:77-109``,
``src/dataloader/simple_dataloader.py:123-135``).  With non-overlapping
patches (patch_size == stride, the only supported configuration) the same
bijection is a static reshape+transpose, which XLA fuses for free — there is
no gather, no scatter, and no data movement beyond a layout change.

Layout contract (must match ``F.unfold`` exactly so position-id bookkeeping
``src/dataloader/simple_dataloader.py:218-226`` lines up):

- image axes are ``(..., C, X, Y)`` where X is the long/flow axis,
- patch index ``p = xb * Ny_patch + yb`` (y-block fastest, as unfold
  enumerates the trailing spatial axis fastest),
- within a patch, pixel ``(i, j)`` maps to image ``(xb*px + i, yb*py + j)``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax.numpy as jnp

if TYPE_CHECKING:  # avoid a circular import through the data package
    from fluid_llm_tpu.data.ds_props import DSProps


def img_to_patch(img: jnp.ndarray, ds_props: "DSProps") -> jnp.ndarray:
    """``(..., C, tot_px, tot_py) -> (..., N_patch, C, px, py)``.

    Equivalent of ``src/utils_model.py:95-109``.
    """
    px, py = ds_props.patch_size
    nx, ny = ds_props.Nx_patch, ds_props.Ny_patch
    lead = img.shape[:-3]
    c = img.shape[-3]
    x = img.reshape(*lead, c, nx, px, ny, py)
    # (..., C, nx, px, ny, py) -> (..., nx, ny, C, px, py)
    nlead = len(lead)
    x = jnp.moveaxis(x, (nlead, nlead + 1, nlead + 3), (nlead + 2, nlead, nlead + 1))
    return x.reshape(*lead, nx * ny, c, px, py)


def patch_to_img(patches: jnp.ndarray, ds_props: "DSProps") -> jnp.ndarray:
    """``(..., N_patch, C, px, py) -> (..., C, tot_px, tot_py)``.

    Equivalent of ``src/utils_model.py:77-92``.
    """
    px, py = ds_props.patch_size
    nx, ny = ds_props.Nx_patch, ds_props.Ny_patch
    lead = patches.shape[:-4]
    c = patches.shape[-3]
    x = patches.reshape(*lead, nx, ny, c, px, py)
    nlead = len(lead)
    # (..., nx, ny, C, px, py) -> (..., C, nx, px, ny, py)
    x = jnp.moveaxis(x, (nlead, nlead + 1, nlead + 2), (nlead + 1, nlead + 3, nlead))
    return x.reshape(*lead, c, nx * px, ny * py)


def fold_features(tokens: jnp.ndarray, ds_props: "DSProps", feat_dim: int) -> jnp.ndarray:
    """Scatter per-patch feature vectors onto the pixel grid.

    ``(..., N_patch, px*py*feat) -> (..., tot_px, tot_py, feat)``

    Equivalent of the decoder's ``F.fold`` (``src/models/layers/GNN/
    decoders.py:229-235``): each patch vector unflattens as (feat, px, py) —
    fold consumes the channel-major flattening — and lands on its patch's
    pixel block.
    """
    opx, opy = ds_props.out_patch_size
    nx, ny = ds_props.Nx_patch, ds_props.Ny_patch
    lead = tokens.shape[:-2]
    x = tokens.reshape(*lead, nx, ny, feat_dim, opx, opy)
    nlead = len(lead)
    # (..., nx, ny, feat, px, py) -> (..., nx, px, ny, py, feat)
    x = jnp.moveaxis(x, (nlead + 2, nlead + 3, nlead + 4), (nlead + 4, nlead + 1, nlead + 3))
    return x.reshape(*lead, nx * opx, ny * opy, feat_dim)


def num_patches(dim_size: int, kern_size: int, stride: int, padding: int = 0) -> int:
    """``src/dataloader/simple_dataloader.py:16-20``."""
    return (dim_size + 2 * padding - kern_size) // stride + 1
