"""Pallas causal attention for the exact-rollout window (~661 tokens).

The exact rollout's per-op profile (BENCHMARKS.md "r3 per-op profile") puts
QK^T + mask + row-max at 17.3 µs/layer — ~2.5× the MXU ideal — because the
hd=64 contraction half-fills the 128-deep systolic array and the causal
mask + row-max run over all L² logits.  The r3 ``short_attention`` kernel
lost for measured structural reasons: per-call transposes to (bh, L, hd),
72 pallas_call launches per layer, and K/V refetched per query block.  This
kernel avoids each of those by construction:

- ONE ``pallas_call`` per layer, grid = (batch, head-groups): 6 programs at
  the reference geometry, not 72 launches;
- inputs are the PACKED ``(bs, L, n_heads*head_dim)`` projection outputs —
  consumed directly, no transpose, no (bs, L, H, hd) relayout;
- K/V live in VMEM once per program and every query block reads them from
  there — zero refetch;
- heads run in 128-lane groups with the other head's query lanes zeroed:
  per-head QK^T at FULL 128-deep contraction (the zeros are free — a
  64-deep contraction costs the same MXU cycles);
- query-block upper-triangle skipping: query block t only contracts keys
  ``0..(t+1)·qb`` — with 2 blocks that removes 25 % of QK^T *and* PV FLOPs
  and the masked-select/row-max run on proportionally fewer logits.  No
  online softmax is needed: causality guarantees the kept key range covers
  every allowed key for the block's queries.

The mask reproduces ``backbone.make_masks`` exactly:
``allowed[i, j] = (j <= i AND valid[j]) OR j == i`` (the forced diagonal
keeps invalid-query rows finite; their outputs are unused).

Differentiation: the kernel is forward-only, but notf-mode training
backpropagates THROUGH the rollout (``trainer.train_step_notf``), so the
public entry carries a ``jax.custom_vjp`` whose backward recomputes the
same math in XLA and differentiates that — exact gradients, no AD rule
needed for the kernel itself.

Role model: the reference's flash-attn slot (``src/models/model.py:54``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, L, hd, qb, scale):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    neg = jnp.finfo(jnp.float32).min
    nblk = -(-L // qb)
    for t in range(nblk):
        r0 = t * qb
        qlen = min(qb, L - r0)
        kext = min((t + 1) * qb, L)
        j = jax.lax.broadcasted_iota(jnp.int32, (qlen, kext), 1)
        ig = r0 + jax.lax.broadcasted_iota(jnp.int32, (qlen, kext), 0)
        vrow = valid_ref[0, :, :kext] != 0  # (1, kext)
        allowed = ((j <= ig) & vrow) | (j == ig)
        k_blk = k_ref[0, :kext, :]
        v_blk = v_ref[0, :kext, :]
        acc = jnp.zeros((qlen, LANE), jnp.float32)
        for h in range(LANE // hd):
            head_lanes = (lane >= h * hd) & (lane < (h + 1) * hd)
            qh = jnp.where(head_lanes, q_ref[0, r0:r0 + qlen, :], 0)
            lg = jax.lax.dot_general(
                qh, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (qlen, kext)
            lg = jnp.where(allowed, lg * scale, neg)
            m = jnp.max(lg, axis=-1, keepdims=True)
            p = jnp.exp(lg - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            vh = jnp.where(head_lanes, v_blk, 0)
            acc = acc + jax.lax.dot_general(
                p.astype(v_blk.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, r0:r0 + qlen, :] = acc.astype(o_ref.dtype)


def _qblock(L: int) -> int:
    """Query-block rows: L split into FLUID_EXACT_QBLOCKS (default 2)
    blocks, rounded up to the 16-sublane tile so block starts stay
    tile-aligned."""
    n = max(1, int(os.environ.get("FLUID_EXACT_QBLOCKS", "2")))
    rows = -(-L // n)  # ceil(L / n)
    return -(-rows // 16) * 16  # ceil to the 16-sublane tile


@functools.partial(jax.jit, static_argnames=("head_dim", "interpret"))
def _call(q, k, v, valid, head_dim: int, interpret: bool = False):
    bs, L, D = q.shape
    assert D % LANE == 0 and LANE % head_dim == 0
    grid = (bs, D // LANE)
    kern = functools.partial(
        _kernel, L=L, hd=head_dim, qb=_qblock(L), scale=head_dim ** -0.5,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bs, L, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, LANE), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, LANE), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, LANE), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            # (bs, 1, L) so the block's last-two dims (1, L) are exactly the
            # array dims — a (1, L) block of a (bs, L) array is rejected by
            # the Mosaic lowering for bs > 1 (sublane block dim 1 is neither
            # 8-divisible nor equal to bs)
            pl.BlockSpec((1, 1, L), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, LANE), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, valid[:, None])


def _xla_packed(q, k, v, valid, n_heads: int, head_dim: int):
    """XLA twin of the kernel math on packed inputs — the backward rule
    differentiates this (same mask/scale/dtype chain as ``backbone._sdpa``'s
    XLA branch, so gradients are exact w.r.t. the model's semantics)."""
    bs, L, D = q.shape
    qh = q.reshape(bs, L, n_heads, head_dim)
    kh = k.reshape(bs, L, n_heads, head_dim)
    vh = v.reshape(bs, L, n_heads, head_dim)
    causal = jnp.tril(jnp.ones((L, L), bool))
    allowed = causal[None] & (valid != 0)[:, None, :]
    allowed = (allowed | jnp.eye(L, dtype=bool)[None])[:, None]
    lg = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                    preferred_element_type=jnp.float32)
    lg = jnp.where(allowed, lg * head_dim ** -0.5, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(lg, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return out.reshape(bs, L, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def causal_attention(q, k, v, valid,
                     n_heads: int, head_dim: int, interpret: bool = False):
    """Packed causal attention: (bs, L, D) x3 + (bs, L) validity -> (bs, L, D).

    Forward = the Pallas kernel; backward = XLA recompute (notf-mode
    rollouts differentiate through this)."""
    return _call(q, k, v, valid, head_dim, interpret)


def _ca_fwd(q, k, v, valid, n_heads, head_dim, interpret):
    return _call(q, k, v, valid, head_dim, interpret), (q, k, v, valid)


def _ca_bwd(n_heads, head_dim, interpret, res, g):
    q, k, v, valid = res
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_packed(a, b, c, valid, n_heads, head_dim), q, k, v
    )
    dq, dk, dv = vjp(g)
    import numpy as np

    dvalid = np.zeros(valid.shape, jax.dtypes.float0)
    return dq, dk, dv, dvalid


causal_attention.defvjp(_ca_fwd, _ca_bwd)


def mode() -> str:
    return os.environ.get("FLUID_EXACT_ATTN", "auto").lower()


def supported(cfg, L: int) -> bool:
    """Full-head models, lane-tiling head groups, and a window long enough
    that the per-call overhead amortises (the rollout's 661 tokens; tiny
    test shapes stay on XLA unless forced)."""
    return (
        cfg.kv_heads == cfg.n_heads
        and cfg.head_dim in (32, 64, 128)
        and (cfg.n_heads * cfg.head_dim) % LANE == 0
        and L >= 256
    )


def use_kernel(cfg, L: int) -> tuple[bool, bool]:
    m = mode()
    if m == "xla" or not supported(cfg, L):
        return False, False
    if m == "interpret":
        return True, True
    if m == "pallas":
        return True, False
    return jax.default_backend() == "tpu", False
