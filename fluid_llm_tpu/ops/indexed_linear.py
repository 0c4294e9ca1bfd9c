"""Pallas indexed linear: ``y = x @ w[li] (+ b[li])`` from a stacked buffer.

The scanned-layer inference paths (``backbone.stack_layers``) carry every
layer's weights in one ``(n_layers, K, N)`` array and pick the current
layer inside a ``lax.scan``.  XLA materialises that pick as a
dynamic-slice COPY before the gemm — for the weight-bandwidth-bound
serving step (bs=1, ~61 tokens) this doubles the dominant HBM traffic
(measured: streaming 1867 -> 1248 steps/s when the copy appears).

This kernel removes the copy: the layer index is a scalar-prefetch
argument consumed by the weight BlockSpec's index map, so the pipeline
DMAs only layer ``li``'s blocks straight from the stacked HBM buffer into
VMEM — speed-of-light traffic, same math.  (Pallas guide:
PrefetchScalarGridSpec.)  No reference counterpart: the reference's
serving loop re-dispatches per-layer torch gemms from python
(``/root/reference/src/models/model.py:168-216``).

Forward-only by design: consumed by the STREAMING decode scan (inference
by construction).  The windowed stacked scan and the pipeline blocks use
the XLA dynamic-slice formulation instead — gradients may flow through
them (notf-mode rollouts differentiate the same code), and
``pallas_call`` has no AD rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(li_ref, x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pick_bn(k: int, n: int, m: int, itemsize: int) -> int:
    """Largest N-block (multiple of 128, divides n) whose working set
    (w block + x + out block) stays well under VMEM."""
    budget = 10 * 1024 * 1024
    bn = n
    while bn > 128:
        if bn % 128 == 0 and (k * bn + m * k + m * bn) * itemsize <= budget:
            return bn
        # shrink to the next divisor of n that is a multiple of 128
        nxt = bn // 2
        while nxt >= 128 and (n % nxt != 0 or nxt % 128 != 0):
            nxt -= 128
        if nxt < 128:
            break
        bn = nxt
    return max(bn, 128) if n % 128 == 0 else n


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(x, w, li, interpret=False):
    m, k = x.shape
    nl, _, n = w.shape
    bn = _pick_bn(k, n, m, x.dtype.itemsize)
    grid = (n // bn,) if n % bn == 0 else (1,)
    if n % bn != 0:
        bn = n
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m, k), lambda j, li_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, bn), lambda j, li_ref: (li_ref[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j, li_ref: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), x, w)


def _xla_indexed_linear(x, w_stacked, b_stacked, li):
    w = jax.lax.dynamic_index_in_dim(w_stacked, li, 0, False)
    y = x @ w.astype(x.dtype)
    if b_stacked is not None:
        y = y + jax.lax.dynamic_index_in_dim(b_stacked, li, 0, False).astype(x.dtype)
    return y


def supported(x, w_stacked) -> bool:
    import os

    if os.environ.get("FLUID_INDEXED_LINEAR", "1") == "0":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    m, k = x.shape[-2:]
    nl, k2, n = w_stacked.shape
    if not (k % 128 == 0 and n % 128 == 0 and x.dtype == w_stacked.dtype):
        # lane-aligned contraction/output dims; anything else falls back
        return False
    # the x block is not tiled over the grid: its (m, k) working set must
    # fit the VMEM budget even at the smallest N-block, or Mosaic fails at
    # compile time PAST any python-level fallback (e.g. batched serving at
    # m = bs*tokens with 4096-wide models)
    itemsize = x.dtype.itemsize
    return (m * k + k * 128 + m * 128) * itemsize <= 10 * 1024 * 1024


def indexed_linear(x, w_stacked, b_stacked, li, interpret: bool = False):
    """``x @ w_stacked[li] + b_stacked[li]`` without materialising the slice.

    x: (..., K); w_stacked: (n_layers, K, N); b_stacked: (n_layers, N) or
    None; li: traced scalar layer index.  Dispatches to the Pallas kernel on
    TPU for lane-aligned shapes (``FLUID_INDEXED_LINEAR=0`` opts out), else
    to the XLA dynamic-slice formulation.  The bias add stays outside the
    kernel (an (N,) slice is negligible and its 1-sublane block can't tile).
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if interpret or supported(x2, w_stacked):
        out = _call(x2, w_stacked, li, interpret=interpret)
        if b_stacked is not None:
            out = out + jax.lax.dynamic_index_in_dim(
                b_stacked, li, 0, False
            ).astype(out.dtype)
    else:
        out = _xla_indexed_linear(x2, w_stacked, b_stacked, li)
    return out.reshape(*lead, w_stacked.shape[-1])
