"""DilResNet baseline: grid-image dilated residual CNN.

Functional equivalent of ``eagle/Models/DilResNet.py:12-93``: conv encoder ->
4 residual blocks of 7 dilated convs (dilations 1,2,4,8,4,2,1, ReLU after
every conv) -> conv decoder; autoregressive diffs with grid-mask BC forcing.
Grid layout is NHWC (TPU-native); the time loop is a ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]

DILATIONS = (1, 2, 4, 8, 4, 2, 1)


def _conv_init(key, c_in, c_out, k=3):
    wk, bk = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(c_in * k * k)
    return {
        "w": jax.random.uniform(wk, (k, k, c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound),
    }


def _conv(x, p, dilation=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def dilresnet_init(key, channels: int = 3, n_block: int = 4, hidden: int = 48) -> Params:
    keys = jax.random.split(key, n_block + 2)
    blocks = []
    for b in range(n_block):
        bkeys = jax.random.split(keys[b], len(DILATIONS))
        blocks.append([_conv_init(k, hidden, hidden) for k in bkeys])
    return {
        "encoder": _conv_init(keys[-2], channels, hidden),
        "blocks": blocks,
        "decoder": _conv_init(keys[-1], hidden, channels),
    }


def dilresnet_step(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """One diff prediction: x (B, H, W, C) -> delta (B, H, W, C)."""
    y = _conv(x, params["encoder"])
    for block in params["blocks"]:
        h = y
        for p, d in zip(block, DILATIONS):
            h = jax.nn.relu(_conv(h, p, d))
        y = y + h
    return _conv(y, params["decoder"])


def dilresnet_apply(
    params: Params,
    state: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    apply_noise: bool = False,
    noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Window rollout (``DilResNet.py:26-61``).

    state: (B, T, H, W, C); mask: (B, T, H, W) bool (True = boundary, forced
    to ground truth each step).  Returns (state_hat, delta, target), each
    (B, T[-1], H, W, C).
    """
    if apply_noise and rng is not None and noise_std > 0:
        nm = (~mask[:, 0])[..., None]
        noise = jax.random.normal(rng, state[:, 0].shape) * noise_std
        state = state.at[:, 0].set(state[:, 0] + noise * nm)

    def step(prev, xs):
        state_t, mask_t = xs
        delta = dilresnet_step(params, prev)
        next_state = prev + delta
        target = state_t - prev
        next_state = jnp.where(mask_t[..., None], state_t, next_state)
        return next_state, (next_state, delta, target)

    xs = (jnp.moveaxis(state[:, 1:], 1, 0), jnp.moveaxis(mask[:, 1:], 1, 0))
    _, (states_hat, deltas, targets) = jax.lax.scan(step, state[:, 0], xs)
    state_hat = jnp.concatenate([state[:, :1], jnp.moveaxis(states_hat, 0, 1)], axis=1)
    return state_hat, jnp.moveaxis(deltas, 0, 1), jnp.moveaxis(targets, 0, 1)


def dilresnet_loss(delta, target, w_pressure: float = 1.0):
    """MSE on per-step diffs (``eagle/train_DilResNet.py`` protocol)."""
    loss_v = jnp.mean((delta[..., :2] - target[..., :2]) ** 2)
    loss_p = jnp.mean((delta[..., 2:] - target[..., 2:]) ** 2)
    return loss_v + w_pressure * loss_p
