"""Patch<->image algebra: round-trip + bit-parity with torch fold/unfold."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fluid_llm_tpu.data.ds_props import DSProps
from fluid_llm_tpu.ops.patching import fold_features, img_to_patch, num_patches, patch_to_img

PROPS = DSProps(Nx_patch=5, Ny_patch=4, patch_size=(16, 16), seq_len=3)


def torch_img_to_patch(img: np.ndarray, props: DSProps) -> np.ndarray:
    """Oracle: the reference's unfold path (``src/utils_model.py:95-109``)."""
    bs, seq, c, tx, ty = img.shape
    t = torch.from_numpy(img).reshape(-1, c, tx, ty)
    px, py = props.patch_size
    patches = F.unfold(t, kernel_size=(px, py), stride=(px, py))
    patches = patches.view(bs, seq, c, px, py, props.N_patch).permute(0, 1, 5, 2, 3, 4)
    return patches.numpy()


def torch_patch_to_img(patches: np.ndarray, props: DSProps) -> np.ndarray:
    """Oracle: the reference's fold path (``src/utils_model.py:77-92``)."""
    bs, seq, n, c, px, py = patches.shape
    t = torch.from_numpy(patches).reshape(-1, n, c * px * py).transpose(-1, -2)
    tx, ty = props.input_tot_size
    img = F.fold(t, output_size=(tx, ty), kernel_size=(px, py), stride=(px, py))
    return img.view(bs, seq, c, tx, ty).numpy()


def test_img_to_patch_matches_torch_unfold(rng):
    img = rng.normal(size=(2, 3, 3, 80, 64)).astype(np.float32)
    ours = np.asarray(img_to_patch(jnp.asarray(img), PROPS))
    oracle = torch_img_to_patch(img, PROPS)
    np.testing.assert_array_equal(ours, oracle)


def test_patch_to_img_matches_torch_fold(rng):
    patches = rng.normal(size=(2, 3, 20, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(patch_to_img(jnp.asarray(patches), PROPS))
    oracle = torch_patch_to_img(patches, PROPS)
    np.testing.assert_array_equal(ours, oracle)


def test_round_trip(rng):
    img = rng.normal(size=(1, 2, 3, 80, 64)).astype(np.float32)
    back = patch_to_img(img_to_patch(jnp.asarray(img), PROPS), PROPS)
    np.testing.assert_array_equal(np.asarray(back), img)


def test_fold_features_matches_torch_fold(rng):
    """Decoder F.fold of feature vectors (``GNN/decoders.py:229-235``)."""
    feat = 7
    props = PROPS
    opx, opy = props.out_patch_size
    tokens = rng.normal(size=(2, 3, props.N_patch, opx * opy * feat)).astype(np.float32)

    ours = np.asarray(fold_features(jnp.asarray(tokens), props, feat))

    t = torch.from_numpy(tokens).reshape(-1, props.N_patch, opx * opy * feat).transpose(-1, -2)
    tx, ty = props.out_tot_size
    img = F.fold(t, output_size=(tx, ty), kernel_size=(opx, opy), stride=(opx, opy))
    oracle = img.permute(0, 2, 3, 1).reshape(2, 3, tx, ty, feat).numpy()
    np.testing.assert_array_equal(ours, oracle)


@pytest.mark.parametrize("dim,kern,stride,expect", [(238, 16, 16, 14), (64, 16, 16, 4)])
def test_num_patches(dim, kern, stride, expect):
    assert num_patches(dim, kern, stride) == expect
