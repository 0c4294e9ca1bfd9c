"""Pallas int8-weight matmul: only quantized bytes cross HBM.

The int8 serving path (``ops/quant.py``, the TPU equivalent of the
reference's bitsandbytes loading, ``src/models/model.py:51``) stores
``{'q': int8 (K, N), 'scale': f32 (N,)}`` per linear and dequantises on
use.  XLA cannot feed a fused dequant into a ``dot`` operand — the bf16
weight copy is MATERIALISED to HBM every step, so the streaming decode
step (weight-read bound: ~88 % of its bf16 roofline, BENCHMARKS.md) paid
full bf16 bytes plus the dequant traffic, and int8 storage bought only
+9 % end to end (2786 → 3046 steps/s).

This kernel keeps the int8 weights as the ONLY weight bytes read from
HBM.  Because the scale is per OUTPUT column, dequantisation commutes
with the contraction::

    y[m, n] = Σ_k x[m, k] · (q[k, n] · s[n])  =  (x @ q)[m, n] · s[n]

so the kernel DMAs int8 tiles, casts them to the activation dtype in VMEM
(exact: |q| ≤ 127 and bf16 holds integers < 256 exactly), contracts on
the MXU with f32 accumulation, and applies the scale once in the output
epilogue.  Grid ``(nm, nn, nk)`` with the K loop innermost accumulating
into a VMEM scratch; blocks are chosen so K and N divide exactly
(transformer dims here are multiples of 256 — anything else falls back
to the XLA dequant path).

Differentiable: a ``custom_vjp`` returns ``dx = g · (q·s)^T`` via the XLA
twin (the quantised-frozen-backbone training regime only needs gradients
THROUGH the frozen linears, never for them).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_MAX_BLOCK_ELEMS = 1536 * 256  # int8 tile bytes; f32 VMEM temp is 4x this


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick(dim: int, cands) -> int | None:
    for c in cands:
        if dim % c == 0:
            return c
    return None


def pick_blocks(m: int, k: int, n: int):
    """(BM, BK, BN) or None when K/N don't tile exactly."""
    bm = min(128, _round_up(max(m, 1), 16))
    bk = _pick(k, (2048, 1536, 1024, 768, 512, 384, 256, 128))
    if bk is None:
        return None
    bn = _pick(n, (512, 256, 128))
    if bn is None:
        return None
    while bk * bn > _MAX_BLOCK_ELEMS and bk > 256:
        nxt = _pick(k, tuple(c for c in (1536, 1024, 768, 512, 384, 256, 128) if c < bk))
        if nxt is None:
            break
        bk = nxt
    if bk * bn > _MAX_BLOCK_ELEMS:
        bn = _pick(n, (256, 128)) or bn
    return bm, bk, bn


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(jnp.float32).astype(x_ref.dtype)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm_2d(x, q, scale, interpret: bool = False):
    m, k = x.shape
    n = q.shape[1]
    blocks = pick_blocks(m, k, n)
    assert blocks is not None, "caller must gate on pick_blocks"
    bm, bk, bn = blocks
    mp = _round_up(m, bm)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    grid = (mp // bm, n // bn, k // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=grid[2]),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, q, scale.astype(jnp.float32).reshape(1, n))
    return out[:m] if mp != m else out


def _impl(x, q, scale, interpret: bool):
    lead = x.shape[:-1]
    y = _qmm_2d(x.reshape(-1, x.shape[-1]), q, scale, interpret=interpret)
    return y.reshape(*lead, q.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul(x, q, scale, interpret: bool = False):
    """``x (..., K) @ dequant(q (K, N), scale (N,)) -> (..., N)`` with int8
    weight reads.  Leading axes of ``x`` are flattened for the kernel."""
    return _impl(x, q, scale, interpret)


def _fwd(x, q, scale, interpret):
    return _impl(x, q, scale, interpret), (q, scale)


def _bwd(interpret, res, g):
    del interpret
    q, scale = res
    # g.dtype == x.dtype (the forward output is cast to the activation dtype)
    w = (q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)).astype(g.dtype)
    dx = g @ w.T
    return dx, np.zeros(q.shape, jax.dtypes.float0), jnp.zeros_like(scale)


int8_matmul.defvjp(_fwd, _bwd)


def mode() -> str:
    """'auto' (kernel on TPU), 'pallas' (force), 'xla' (off), 'interpret'."""
    return os.environ.get("FLUID_QMM", "auto").lower()


def use_kernel(k: int, n: int, m_hint: int = 1) -> tuple[bool, bool]:
    """(use, interpret) for an int8 leaf of shape (K, N) on this backend."""
    env = mode()
    if env == "xla" or pick_blocks(m_hint, k, n) is None:
        return False, False
    if env == "interpret":
        return True, True
    if env == "pallas":
        return True, False
    return jax.default_backend() == "tpu", False
