"""Pallas decode attention over the streaming slab KV cache.

The streaming serving step (``backbone.apply_streaming``) is cache-READ
bound: the XLA formulation flattens the slab cache into a token axis every
decode step (materialising reshape), re-lays the heads out for the einsum
(copy), and runs the hd=64 QK^T as a convolution — measured reshape 14 % +
copy 9.5 % + QK^T 9.9 % of device time on the r3 build (BENCHMARKS.md).
This kernel reads the cache IN PLACE instead:

- the K/V inputs are the full stacked cache buffers
  ``(L, bs, slots, P̂, D)`` with the layer index baked into the BlockSpec
  index maps — the pipeline DMAs exactly layer ``li``'s 128-lane head-group
  block from HBM; no per-layer slice, no flatten, no head relayout;
- slabs are tile-aligned (``P̂`` is a 16-sublane multiple,
  ``backbone._slab_tokens``) and the sinks live in the last slot of the
  SAME buffer, so the in-kernel ``(slots, P̂, lanes) -> (slots*P̂, lanes)``
  flatten is layout-trivial and there is nothing to concatenate;
- heads are processed in 128-lane groups (``hd=64`` -> 2 heads/group): the
  per-head QK^T runs at FULL 128-deep MXU contraction with the other
  head's query lanes zeroed — the zeros contribute nothing, and a 64-deep
  contraction costs the same MXU cycles anyway;
- one masked softmax per head over all keys, f32 logits resident in VMEM.

Validity/causality is precomputed OUTSIDE as one int32 key-position row
(pad rows / unwritten slots -> INT32_MAX): ``allowed = key_pos <= q_pos``
reproduces ``apply_streaming``'s mask exactly (every resident token
precedes the incoming frame; intra-frame causality falls out of the
consecutive positions).

Forward-only by design (serving path; no AD rule).  Role model: the
flash-attn slot of the reference (``src/models/model.py:54``) — the
reference has no KV cache at all (re-encodes the window per step,
``model.py:168-216``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_BIG = jnp.iinfo(jnp.int32).max


def _kernel(q_ref, k_ref, v_ref, kp_ref, q0_ref, o_ref,
            *, slots, pp, hd, kpad, scale):
    tot = slots * pp
    npad = kpad - tot
    k = k_ref[0, 0].reshape(tot, LANE)
    v = v_ref[0, 0].reshape(tot, LANE)
    if npad:
        zpad = jnp.zeros((npad, LANE), k.dtype)
        k = jnp.concatenate([k, zpad], axis=0)
        v = jnp.concatenate([v, zpad], axis=0)
    P = q_ref.shape[1]
    qpos = q0_ref[0, 0] + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    allowed = kp_ref[:, :] <= qpos  # (1, kpad) x (P, 1) -> (P, kpad)
    q = q_ref[0]  # (P, LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    neg = jnp.finfo(jnp.float32).min
    acc = jnp.zeros((P, LANE), jnp.float32)
    for t in range(LANE // hd):
        head_lanes = (lane >= t * hd) & (lane < (t + 1) * hd)
        qh = jnp.where(head_lanes, q, 0)
        lg = jax.lax.dot_general(
            qh, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, kpad)
        lg = jnp.where(allowed, lg * scale, neg)
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vh = jnp.where(head_lanes, v, 0)
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("li", "head_dim", "interpret")
)
def slab_decode(q, k_slabs, v_slabs, key_pos, q0,
                li: int, head_dim: int, interpret: bool = False):
    """One decode step of slab attention for layer ``li``.

    q:        (bs, P, D) rope'd queries, heads packed on the last dim
    k_slabs:  (L, bs, slots, P̂, D) stacked slab cache (read in place;
              post-write — the new frame's K/V are already in their slot)
    key_pos:  (1, kpad) int32 — per-key absolute position in slab order,
              INT32_MAX for pad rows / unwritten slots (``pad_key_pos``)
    q0:       (1, 1) int32 — absolute position of the first query token
    returns   (bs, P, D) attention output (ready for the o-projection)
    """
    bs, P, D = q.shape
    L, _, slots, pp, _ = k_slabs.shape
    kpad = key_pos.shape[1]
    assert D % LANE == 0 and LANE % head_dim == 0
    grid = (bs, D // LANE)
    kern = functools.partial(
        _kernel, slots=slots, pp=pp, hd=head_dim, kpad=kpad,
        scale=head_dim ** -0.5,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bs, P, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P, LANE), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slots, pp, LANE),
                         lambda b, g, _li=li: (_li, b, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slots, pp, LANE),
                         lambda b, g, _li=li: (_li, b, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad), lambda b, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, P, LANE), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k_slabs, v_slabs, key_pos, q0)


def pad_key_pos(kp_row: jnp.ndarray) -> jnp.ndarray:
    """(slots*P̂,) int32 -> (1, kpad) lane-padded with INT32_MAX."""
    pad = (-kp_row.shape[0]) % LANE
    if pad:
        kp_row = jnp.pad(kp_row, (0, pad), constant_values=_BIG)
    return kp_row[None]


def mode() -> str:
    """Dispatch mode: 'auto' (kernel on TPU), 'pallas' (force), 'xla'
    (force off), 'interpret' (kernel in interpreter mode — CPU tests)."""
    return os.environ.get("FLUID_STREAM_ATTN", "auto").lower()


def supported(cfg) -> bool:
    """Shape gate: full-head attention (no GQA repeat in the kernel) and
    head groups that tile the 128-lane registers."""
    return (
        cfg.kv_heads == cfg.n_heads
        and cfg.head_dim in (32, 64, 128)
        and (cfg.n_heads * cfg.head_dim) % LANE == 0
    )


def use_kernel(cfg) -> tuple[bool, bool]:
    """(use, interpret) for the current backend + env."""
    m = mode()
    if m == "xla" or not supported(cfg):
        return False, False
    if m == "interpret":
        return True, True
    if m == "pallas":
        return True, False
    return jax.default_backend() == "tpu", False
