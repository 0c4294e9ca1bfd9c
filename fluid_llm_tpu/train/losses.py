"""Masked losses and the combined velocity/pressure objective.

Functional JAX equivalents of ``src/losses.py``.  Mask convention follows the
reference: ``mask == True`` marks boundary/exterior pixels that are *excluded*
from the loss (``src/losses.py:24-27``).  The reference's dynamic
``masked_select`` becomes masked sums with static shapes — identical values,
jit-compatible.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def _sel_mean(values: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` over elements where ``sel`` is True."""
    sel = sel.astype(values.dtype)
    return jnp.sum(values * sel) / jnp.maximum(jnp.sum(sel), 1.0)


def mape_loss(preds, target, mask, eps: float = 1e-5):
    """``src/losses.py:9-38``: |(p-t)/max(|t|,eps)| clamped to 1, masked mean."""
    sel = ~mask
    target_abs = jnp.maximum(jnp.abs(target), eps)
    loss = jnp.abs((preds - target) / target_abs)
    loss = jnp.minimum(loss, 1.0)
    return _sel_mean(loss, sel)


def smape_loss(preds, target, mask, eps: float = 1e-5):
    """``src/losses.py:41-65``.

    Note the reference averages the masked SMAPE over *all* elements (mask
    zeros included) rather than the selected count — reproduced exactly.
    """
    sel = (~mask).astype(preds.dtype)
    delta = jnp.abs(target - preds)
    scale = jnp.abs(target) + jnp.abs(preds) + eps
    return 2.0 * jnp.mean(delta / scale * sel)


def mse_loss(preds, target, mask):
    """``src/losses.py:68-94``: masked sum of squared error / selected count."""
    sel = ~mask
    return _sel_mean((preds - target) ** 2, sel)


def rmse_loss(preds, target, mask):
    """``src/losses.py:100-121``.

    The reference zeroes masked pixels but divides by the *total* element
    count before the sqrt — reproduced exactly.
    """
    sel = (~mask).astype(preds.dtype)
    return jnp.sqrt(jnp.mean(((target - preds) * sel) ** 2))


def mae_loss(preds, target, mask):
    """``src/losses.py:127-153``: masked sum of |error| / selected count."""
    sel = ~mask
    return _sel_mean(jnp.abs(preds - target), sel)


_LOSS_FNS: dict[str, Callable] = {
    "mape": mape_loss,
    "smape": smape_loss,
    "mse": mse_loss,
    "rmse": rmse_loss,
    "mae": mae_loss,
}


def combined_loss(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    loss_fns: Sequence[str],
    loss_weights: Sequence[float],
    pressure_weight: float = 1.0,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """``src/losses.py:159-199``: per-loss velocity/pressure split.

    ``preds/target/mask`` are images ``(bs, seq, 3, tot_px, tot_py)`` with
    channels (Vx, Vy, P).  Each loss is evaluated separately on velocity
    (channels :2) and pressure (channel 2:), combined as
    ``vel + pressure_weight * press``, then weighted and summed.

    Reference quirk, knowingly fixed: ``src/losses.py:178`` slices the
    pressure mask as ``mask[:, :, 0:]`` (all three channels).  Because the
    dataset repeats the mask identically across channels
    (``simple_dataloader.py:100``), broadcasting the 1-channel pressure
    prediction against the 3-channel mask triples both numerator and
    denominator of every masked mean — the loss *values* are unchanged.  We
    use the pressure channel's own mask, which is value-equivalent and shape
    -correct.
    """
    p_preds, p_target, p_mask = preds[:, :, 2:], target[:, :, 2:], mask[:, :, 2:]
    v_preds, v_target, v_mask = preds[:, :, :2], target[:, :, :2], mask[:, :, :2]

    tot_loss = 0.0
    all_losses: dict[str, jnp.ndarray] = {}
    for name, weight in zip(loss_fns, loss_weights):
        fn = _LOSS_FNS[name]
        loss_p = fn(p_preds, p_target, p_mask)
        loss_v = fn(v_preds, v_target, v_mask)
        loss_val = loss_v + pressure_weight * loss_p
        tot_loss = tot_loss + loss_val * weight
        all_losses[name.upper()] = loss_val
    return tot_loss, all_losses
