"""Fused Pallas kernel for the 5-slot grid GATv2 (forward + backward).

The XLA formulation in ``ops/grid_gnn.py`` is HBM-bound: each conv makes
~25 passes over (frames, X, Y, F) tensors for shifts/logits/softmax (the
MLPGNN decoder runs 3 such convs over the full 240x64 pixel grid for every
frame of every sample — ~40 % of the training step).  This kernel keeps one
frame resident in VMEM and fuses the whole slot attention: traffic drops to
read x_l, x_r + write out (3 passes), plus the same again for the fused
backward.

Math (per head, per pixel p; slots s in {self, ±x, ±y}; v_s = x_l[n_s(p)]):

    u_s   = leaky_relu(x_r[p] + v_s)
    logit = u_s . att          (masked at frame edges)
    a     = softmax_s(logit)
    out   = sum_s a_s v_s

Backward (g = dL/dout):
    dlogit_s = a_s (g.v_s - sum_t a_t g.v_t)
    d x_r[p]    += sum_s dlogit_s * att * lrelu'(u_s)
    d x_l[n_s]  += a_s g + dlogit_s * att * lrelu'(u_s)   (reverse shift)
    d att       += sum_p dlogit_s * u_s

Weight/bias grads are recovered outside the kernel from d x_l / d x_r.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2
_SHIFTS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
# conservative VMEM budget for one frame's working set
_VMEM_LIMIT_ELEMS = 240 * 128 * 64


def _lrelu(u):
    # compare in f32: Mosaic lacks 16-bit vector comparisons on this target
    pos = u.astype(jnp.float32) > 0.0
    return jnp.where(pos, u, jnp.asarray(NEG_SLOPE, u.dtype) * u), pos


def _slot_mask(X, Y, dx, dy):
    rows = jax.lax.broadcasted_iota(jnp.int32, (X, Y), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (X, Y), 1)
    m = jnp.ones((X, Y), jnp.float32)
    if dx == 1:
        m = jnp.where(rows == X - 1, 0.0, m)
    elif dx == -1:
        m = jnp.where(rows == 0, 0.0, m)
    if dy == 1:
        m = jnp.where(cols == Y - 1, 0.0, m)
    elif dy == -1:
        m = jnp.where(cols == 0, 0.0, m)
    return m


def _roll2(x, dx, dy):
    """Neighbour value x[p + (dx, dy)] at each pixel (wrap killed by mask).

    Implemented as static slice + concat: Mosaic's rotate only handles
    32-bit element types and these arrays are bf16 in training.
    """
    out = x
    if dx == 1:
        out = jnp.concatenate([out[1:], out[:1]], axis=0)
    elif dx == -1:
        out = jnp.concatenate([out[-1:], out[:-1]], axis=0)
    if dy == 1:
        out = jnp.concatenate([out[:, 1:], out[:, :1]], axis=1)
    elif dy == -1:
        out = jnp.concatenate([out[:, -1:], out[:, :-1]], axis=1)
    return out


def _fwd_kernel(xl_ref, xr_ref, att_ref, out_ref, *, heads, cdim):
    # F-wide arrays stay in the input dtype (bf16 in training) so a full
    # frame fits scoped VMEM; per-head softmax stats are f32
    X, Y = xl_ref.shape[1], xl_ref.shape[2]
    cd = xl_ref.dtype
    xl = xl_ref[0]  # (X, Y, H*C)
    xr = xr_ref[0]
    att = att_ref[:].astype(cd).reshape(heads * cdim)

    def head_sum(a):
        return jnp.stack(
            [
                jnp.sum(a[:, :, h * cdim:(h + 1) * cdim].astype(jnp.float32), axis=-1)
                for h in range(heads)
            ],
            axis=-1,
        )

    def head_expand(a, dt):
        # broadcast in f32 then cast: Mosaic only supports minor-dim
        # broadcast for 32-bit types
        return jnp.concatenate(
            [
                jnp.repeat(a[:, :, h:h + 1].astype(jnp.float32), cdim, axis=-1)
                for h in range(heads)
            ],
            axis=-1,
        ).astype(dt)

    # running max over slots per head
    m = jnp.full((X, Y, heads), -jnp.inf, jnp.float32)
    for dx, dy in _SHIFTS:
        v = _roll2(xl, dx, dy)
        u, _ = _lrelu(xr + v)
        logit = head_sum(u * att)
        mask = _slot_mask(X, Y, dx, dy)
        logit = jnp.where(mask[:, :, None] > 0, logit, -jnp.inf)
        m = jnp.maximum(m, logit)

    denom = jnp.zeros((X, Y, heads), jnp.float32)
    acc = jnp.zeros((X, Y, heads * cdim), cd)
    for dx, dy in _SHIFTS:
        v = _roll2(xl, dx, dy)
        u, _ = _lrelu(xr + v)
        logit = head_sum(u * att)
        mask = _slot_mask(X, Y, dx, dy)
        w = jnp.where(mask[:, :, None] > 0, jnp.exp(logit - m), 0.0)  # (X, Y, H) f32
        denom = denom + w
        acc = acc + head_expand(w, cd) * v

    out_ref[0] = (acc.astype(jnp.float32) / head_expand(denom, jnp.float32)).astype(
        out_ref.dtype
    )


def _head_sum(a, heads, cdim):
    # (X, Y, H*C) -> (X, Y, H) f32: per-head channel sum
    return jnp.stack(
        [
            jnp.sum(a[:, :, h * cdim:(h + 1) * cdim].astype(jnp.float32), axis=-1)
            for h in range(heads)
        ],
        axis=-1,
    )


def _head_expand(a, dt, heads, cdim):
    # (X, Y, H) -> (X, Y, H*C); broadcast in f32 then cast (Mosaic only
    # supports minor-dim broadcast for 32-bit types)
    return jnp.concatenate(
        [
            jnp.repeat(a[:, :, h:h + 1].astype(jnp.float32), cdim, axis=-1)
            for h in range(heads)
        ],
        axis=-1,
    ).astype(dt)


def _bwd_stats_kernel(xl_ref, xr_ref, att_ref, g_ref, m_ref, denom_ref, gvm_ref,
                      *, heads, cdim):
    """Backward pass 1: softmax stats (m, denom, g.out per head)."""
    X, Y = xl_ref.shape[1], xl_ref.shape[2]
    cd = xl_ref.dtype
    xl = xl_ref[0]
    xr = xr_ref[0]
    g = g_ref[0].astype(cd)
    att = att_ref[:].astype(cd).reshape(heads * cdim)

    m = jnp.full((X, Y, heads), -jnp.inf, jnp.float32)
    for dx, dy in _SHIFTS:
        v = _roll2(xl, dx, dy)
        u, _ = _lrelu(xr + v)
        logit = _head_sum(u * att, heads, cdim)
        mask = _slot_mask(X, Y, dx, dy)
        logit = jnp.where(mask[:, :, None] > 0, logit, -jnp.inf)
        m = jnp.maximum(m, logit)
    denom = jnp.zeros((X, Y, heads), jnp.float32)
    gv_sum = jnp.zeros((X, Y, heads), jnp.float32)
    for dx, dy in _SHIFTS:
        v = _roll2(xl, dx, dy)
        u, _ = _lrelu(xr + v)
        logit = _head_sum(u * att, heads, cdim)
        mask = _slot_mask(X, Y, dx, dy)
        w = jnp.where(mask[:, :, None] > 0, jnp.exp(logit - m), 0.0)
        denom = denom + w
        gv_sum = gv_sum + w * _head_sum(g * v, heads, cdim)
    m_ref[0] = m
    denom_ref[0] = denom
    gvm_ref[0] = gv_sum / denom


def _bwd_grad_kernel(xl_ref, xr_ref, att_ref, g_ref, m_ref, denom_ref, gvm_ref,
                     dxl_ref, dxr_ref, datt_ref, *, heads, cdim):
    """Backward pass 2: input/parameter gradients from the saved stats."""
    X, Y = xl_ref.shape[1], xl_ref.shape[2]
    cd = xl_ref.dtype
    xl = xl_ref[0]
    xr = xr_ref[0]
    g = g_ref[0].astype(cd)
    att = att_ref[:].astype(cd).reshape(heads * cdim)
    m = m_ref[0]
    denom = denom_ref[0]
    gv_mean = gvm_ref[0]

    dxr = jnp.zeros((X, Y, heads * cdim), cd)
    dxl = jnp.zeros((X, Y, heads * cdim), cd)
    datt = jnp.zeros((heads * cdim,), jnp.float32)
    for dx, dy in _SHIFTS:
        v = _roll2(xl, dx, dy)
        u, pos = _lrelu(xr + v)
        du = jnp.where(
            pos, jnp.asarray(1.0, jnp.float32), jnp.asarray(NEG_SLOPE, jnp.float32)
        ).astype(cd)
        logit = _head_sum(u * att, heads, cdim)
        mask = _slot_mask(X, Y, dx, dy)
        w = jnp.where(mask[:, :, None] > 0, jnp.exp(logit - m), 0.0)
        a = w / denom  # (X, Y, H) f32
        dlogit = a * (_head_sum(g * v, heads, cdim) - gv_mean)
        dlog_full = _head_expand(dlogit, cd, heads, cdim)
        chain = dlog_full * att * du  # (X, Y, H*C)
        dxr = dxr + chain
        # contributions to x_l at the SOURCE pixel: reverse shift (wrapped
        # values are zero because invalid slots have a = chain = 0)
        contrib = _head_expand(a, cd, heads, cdim) * g + chain
        dxl = dxl + _roll2(contrib, -dx, -dy)
        datt = datt + jnp.sum((dlog_full * u).astype(jnp.float32), axis=(0, 1))

    dxl_ref[0] = dxl.astype(dxl_ref.dtype)
    dxr_ref[0] = dxr.astype(dxr_ref.dtype)
    datt_ref[0, 0] = datt.astype(jnp.float32)


def _call_fwd(xl, xr, att, heads, cdim, interpret=False):
    Bf, X, Y, F = xl.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, cdim=cdim),
        grid=(Bf,),
        in_specs=[
            pl.BlockSpec((1, X, Y, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, Y, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, cdim), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, X, Y, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bf, X, Y, F), xl.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xl, xr, att)


def _call_bwd(xl, xr, att, g, heads, cdim, interpret=False):
    """Two-kernel backward (stats, then grads): each compiles with a modest
    working set; stats tensors travel through HBM between the calls."""
    Bf, X, Y, F = xl.shape
    frame = lambda: pl.BlockSpec((1, X, Y, F), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    stat = lambda: pl.BlockSpec((1, X, Y, heads), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    att_spec = pl.BlockSpec((heads, cdim), lambda b: (0, 0), memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    m, denom, gvm = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, heads=heads, cdim=cdim),
        grid=(Bf,),
        in_specs=[frame(), frame(), att_spec, frame()],
        out_specs=(stat(), stat(), stat()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Bf, X, Y, heads), jnp.float32) for _ in range(3)
        ),
        compiler_params=cp,
        interpret=interpret,
    )(xl, xr, att, g)

    dxl, dxr, datt = pl.pallas_call(
        functools.partial(_bwd_grad_kernel, heads=heads, cdim=cdim),
        grid=(Bf,),
        in_specs=[frame(), frame(), att_spec, frame(), stat(), stat(), stat()],
        out_specs=(
            frame(),
            frame(),
            pl.BlockSpec((1, 1, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bf, X, Y, F), xl.dtype),
            jax.ShapeDtypeStruct((Bf, X, Y, F), xl.dtype),
            jax.ShapeDtypeStruct((Bf, 1, F), jnp.float32),
        ),
        compiler_params=cp,
        interpret=interpret,
    )(xl, xr, att, g, m, denom, gvm)
    return dxl, dxr, datt.sum(axis=(0, 1)).reshape(heads, cdim)


def _xla_slot_attention(xl, xr, att, heads, cdim):
    """Dense XLA fallback (same math; used for the default backward)."""
    lead = xl.shape[:-1]
    xr_h = xr.reshape(*lead, heads, cdim)
    X, Y = xl.shape[-3], xl.shape[-2]
    logits, values, masks = [], [], []
    for dx, dy in _SHIFTS:
        # plain jnp roll here (outside pallas)
        v = jnp.roll(xl, (-dx, -dy), axis=(-3, -2))
        vh = v.reshape(*lead, heads, cdim)
        e = jax.nn.leaky_relu(xr_h + vh, NEG_SLOPE)
        logits.append(jnp.einsum("...hc,hc->...h", e, att.astype(e.dtype)))
        values.append(vh)
        masks.append(_slot_mask(X, Y, dx, dy) > 0)
    logits = jnp.stack(logits, axis=-2).astype(jnp.float32)
    values = jnp.stack(values, axis=-3)  # (..., S, H, C)
    mask = jnp.stack(masks, axis=-1)[..., :, None]
    logits = jnp.where(mask, logits, -jnp.inf)
    alpha = jax.nn.softmax(logits, axis=-2).astype(xl.dtype)
    out = jnp.einsum("...shc,...sh->...hc", values, alpha)
    return out.reshape(*lead, heads * cdim)


# The fused Pallas backward compiles in interpret mode and passes gradient
# parity, but the axon remote-compile helper is killed (host OOM) lowering
# it for real TPU shapes — default to XLA recompute for the backward and
# keep the kernel behind FLUID_GNN_FUSED_BWD=1 for toolchains that take it.
import os as _os

_USE_FUSED_BWD = _os.environ.get("FLUID_GNN_FUSED_BWD") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_slot_attention(xl, xr, att, heads: int, cdim: int, interpret: bool = False):
    """xl/xr: (Bf, X, Y, heads*cdim); att: (heads, cdim) -> (Bf, X, Y, heads*cdim)."""
    return _call_fwd(xl, xr, att, heads, cdim, interpret)


def _fsa_fwd(xl, xr, att, heads, cdim, interpret):
    return _call_fwd(xl, xr, att, heads, cdim, interpret), (xl, xr, att)


def _fsa_bwd(heads, cdim, interpret, res, g):
    xl, xr, att = res
    if _USE_FUSED_BWD or interpret:
        dxl, dxr, datt = _call_bwd(xl, xr, att, g, heads, cdim, interpret)
        return dxl, dxr, datt.astype(att.dtype)
    _, vjp = jax.vjp(lambda a, b, c: _xla_slot_attention(a, b, c, heads, cdim), xl, xr, att)
    return vjp(g)


fused_slot_attention.defvjp(_fsa_fwd, _fsa_bwd)


def supported(x_shape, heads: int, cdim: int, min_frames: int = 16) -> bool:
    """Use the kernel only when the frame batch amortises launch overhead
    and one frame fits the single-program VMEM budget.  At small batches
    (e.g. the bs=1 rollout) XLA's fused elementwise path is faster."""
    X, Y, F = x_shape[-3], x_shape[-2], x_shape[-1]
    n_frames = 1
    for d in x_shape[:-3]:
        n_frames *= d
    return (
        n_frames >= min_frames
        and X * Y * F <= _VMEM_LIMIT_ELEMS
        and F == heads * cdim
        # heads > 1 trips a Mosaic "unsupported shape cast" in the per-head
        # reduction on this toolchain; production decoders use heads=1
        # (``config.py:81``, matching the reference's GATv2 default)
        and heads == 1
    )
