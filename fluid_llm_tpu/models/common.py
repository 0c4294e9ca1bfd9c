"""Shared functional building blocks: MLP and CNN stacks.

Equivalents of ``src/models/layers/MLP.py`` and ``src/models/layers/CNN.py``:
configurable activation, optional zero-init of the last layer, activation
applied between (not after) layers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

ACTS = {
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "linear": lambda x: x,
}


def _kaiming_linear(key, d_in, d_out):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(wk, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (d_out,), jnp.float32, -bound, bound),
    }


def mlp_init(key, in_dim, out_dim, hid_dim, num_layers, zero_last=False) -> list[dict]:
    """``src/models/layers/MLP.py:4-47``."""
    if num_layers <= 1:
        return [_kaiming_linear(key, in_dim, out_dim)]
    keys = jax.random.split(key, num_layers)
    layers = [_kaiming_linear(keys[0], in_dim, hid_dim)]
    for i in range(1, num_layers - 1):
        layers.append(_kaiming_linear(keys[i], hid_dim, hid_dim))
    last = _kaiming_linear(keys[-1], hid_dim, out_dim)
    if zero_last:
        last = {"w": jnp.zeros_like(last["w"]), "b": jnp.zeros_like(last["b"])}
    layers.append(last)
    return layers


def mlp_apply(layers: list[dict], x: jnp.ndarray, act: str) -> jnp.ndarray:
    fn = ACTS[act]
    for i, p in enumerate(layers):
        x = x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
        if i < len(layers) - 1:
            x = fn(x)
    return x


def _conv_init(key, c_in, c_out, ksize):
    wk, bk = jax.random.split(key)
    fan_in = c_in * ksize * ksize
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        # HWIO layout
        "w": jax.random.uniform(wk, (ksize, ksize, c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound),
    }


def cnn_init(key, in_dim, out_dim, hid_dim, num_layers, zero_last=False) -> list[dict]:
    """``src/models/layers/CNN.py:4-50`` (3x3, padding 1)."""
    if num_layers <= 1:
        return [_conv_init(key, in_dim, out_dim, 3)]
    keys = jax.random.split(key, num_layers)
    layers = [_conv_init(keys[0], in_dim, hid_dim, 3)]
    for i in range(1, num_layers - 1):
        layers.append(_conv_init(keys[i], hid_dim, hid_dim, 3))
    last = _conv_init(keys[-1], hid_dim, out_dim, 3)
    if zero_last:
        last = {"w": jnp.zeros_like(last["w"]), "b": jnp.zeros_like(last["b"])}
    layers.append(last)
    return layers


def _conv1d_init(key, c_in, c_out, ksize):
    """torch nn.Conv1d default init: U(+-1/sqrt(c_in*ksize)) for w and b."""
    wk, bk = jax.random.split(key)
    fan_in = c_in * ksize
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        # WIO layout (spatial, in, out) for lax.conv_general_dilated NWC
        "w": jax.random.uniform(wk, (ksize, c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound),
    }


def cnn1d_init(key, in_dim, out_dim, hid_dim, num_layers, zero_last=False) -> list[dict]:
    """``src/models/layers/CNN.py:4-50`` with ``conv_type='1d'`` (kernel 3,
    zero padding 1) — the layer stack used by the ``CNN`` patch decoder
    (``patch_decoder.py:22-30``)."""
    if num_layers <= 1:
        return [_conv1d_init(key, in_dim, out_dim, 3)]
    keys = jax.random.split(key, num_layers)
    layers = [_conv1d_init(keys[0], in_dim, hid_dim, 3)]
    for i in range(1, num_layers - 1):
        layers.append(_conv1d_init(keys[i], hid_dim, hid_dim, 3))
    last = _conv1d_init(keys[-1], hid_dim, out_dim, 3)
    if zero_last:
        last = {"w": jnp.zeros_like(last["w"]), "b": jnp.zeros_like(last["b"])}
    layers.append(last)
    return layers


def cnn1d_apply(layers: list[dict], x: jnp.ndarray, act: str) -> jnp.ndarray:
    """x: (batch, length, channels) NWC; returns NWC.  Activation between
    layers only, like the 2-D stack (``CNN.py:53-57``)."""
    fn = ACTS[act]
    for i, p in enumerate(layers):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["b"].astype(x.dtype)
        if i < len(layers) - 1:
            x = fn(x)
    return x


def cnn_apply(layers: list[dict], x: jnp.ndarray, act: str, pool_output: bool) -> jnp.ndarray:
    """x: (batch, H, W, C) NHWC; returns NHWC (or (batch, C) if pooled)."""
    fn = ACTS[act]
    for i, p in enumerate(layers):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(x.dtype)
        if i < len(layers) - 1:
            x = fn(x)
    if pool_output:
        x = jnp.mean(x, axis=(-3, -2))
    return x


def leading_flatten(x: jnp.ndarray, keep: int) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """Flatten all but the last ``keep`` axes; return (flat, lead_shape)."""
    lead = x.shape[: x.ndim - keep]
    return x.reshape((-1,) + x.shape[x.ndim - keep:]), lead
