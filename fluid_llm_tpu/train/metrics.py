"""N-RMSE metric and loss-normalisation helpers.

JAX equivalents of ``src/utils_model.py:48-74,112-145``.  ``std`` matches
torch's default Bessel-corrected estimator (ddof=1).
"""

from __future__ import annotations

import jax.numpy as jnp


def aux_calc_n_rmse(preds, target, bc_mask):
    """``src/utils_model.py:48-56``: masked per-(batch, step) RMSE.

    Note the reference zeroes masked pixels but averages over *all* pixels —
    reproduced exactly (normalisation constants were computed this way).
    """
    error = (preds - target) * (~bc_mask).astype(preds.dtype)
    mse = jnp.mean(error**2, axis=(-1, -2, -3))
    return jnp.sqrt(mse)


def calc_n_rmse(preds, target, bc_mask):
    """``src/utils_model.py:59-74``.

    ``preds/target/bc_mask``: images ``(bs, seq_len, 3, tot_px, tot_py)``.
    Returns per-(batch, step) N-RMSE = RMSE(velocity) + RMSE(pressure),
    shape ``(bs, seq_len)``.
    """
    v = aux_calc_n_rmse(preds[:, :, :2], target[:, :, :2], bc_mask[:, :, :2])
    p = aux_calc_n_rmse(preds[:, :, 2:], target[:, :, 2:], bc_mask[:, :, 2:])
    return v + p


def _std(x, axis):
    """torch.Tensor.std default: unbiased (ddof=1)."""
    return jnp.std(x, axis=axis, keepdims=True, ddof=1)


def normalise_diffs(targs, preds, norm_const, channel_indep: bool):
    """``src/utils_model.py:112-127``: scale preds+targets by target-diff std.

    ``targs/preds``: images ``(bs, seq_len, 3, tot_px, tot_py)``.
    """
    if channel_indep:
        targ_std = _std(targs, axis=(-1, -2, -4))
    else:
        targ_std = _std(targs, axis=(-1, -2, -3, -4))
    scale = targ_std + norm_const
    return targs / scale, preds / scale


def normalise_states(diffs, targs, preds, norm_const, channel_indep: bool):
    """``src/utils_model.py:130-145``: scale state preds+targets by diff std.

    ``diffs``: patches ``(bs, seq_len, N_patch, 3, px, py)``;
    ``targs/preds``: images ``(bs, seq_len, 3, tot_px, tot_py)``.
    """
    if channel_indep:
        # std over (py, px, N_patch, seq_len) -> (bs, 1, 1, 3, 1, 1); the
        # reference then squeezes the seq axis -> (bs, 1, 3, 1, 1).
        diff_std = _std(diffs, axis=(-1, -2, -4, -5))
        diff_std = jnp.squeeze(diff_std, axis=1)
    else:
        # std over everything but batch -> (bs, 1, 1, 1, 1, 1); the reference
        # squeezes the last axis -> (bs, 1, 1, 1, 1).
        diff_std = _std(diffs, axis=(-1, -2, -3, -4, -5))
        diff_std = jnp.squeeze(diff_std, axis=-1)
    scale = diff_std + norm_const
    return targs / scale, preds / scale
