"""Fused Pallas kernel for the 5-slot grid GATv2 (forward + backward).

The XLA formulation in ``ops/grid_gnn.py`` is HBM-bound: each conv makes
~25 passes over (frames, X, Y, F) tensors for shifts/logits/softmax (the
MLPGNN decoder runs 3 such convs over the full 240x64 pixel grid for every
frame of every sample — measured 55 % of the anchor training step, see
BENCHMARKS.md).  These kernels keep one frame resident in VMEM and fuse the
whole slot attention; traffic drops to ~3 passes forward / ~8 backward.

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

Layout design (the round-1/2 lessons): in the natural (X, Y, F) layout the
minor dims (64, 48) fill only 48/128 lanes per vreg — a first fused attempt
never lowered (live-vreg blowup), and a row-tiled variant compiled but ran
4x SLOWER than XLA (VPU-bound at 37 % lane utilisation).  The kernels here
work CHANNELS-FIRST, (F, Y, X) with X=240 on lanes (94 % utilisation after
padding to 256): x-shifts are lane slice+concat, y-shifts sublane
slice+concat, and per-head logits are (Y, X) maps reduced over the *outer*
channel dim.  An in-kernel ``fori_loop`` over F-chunks bounds the live set
(Mosaic compile memory), structured in phases:

  forward:  A) accumulate per-slot logit maps over F-chunks;
            B) softmax over the 5 maps (tiny);
            C) second F-chunk pass: out = sum_s alpha_s * v_s.
  backward: A) accumulate per-slot logit AND g.v maps;
            B) alpha, dlogit maps;
            C) F-chunk pass emitting dxr, dxl (reverse-shifted), datt.

Wrapped slot values at frame edges are killed by the (Y, X) masks, so no
halo or padding is needed.  The host-side transpose to channels-first is two
cheap XLA layout passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2
_SHIFTS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
_F_CHUNK = 16  # channel rows per loop iteration (compile memory, not VMEM)
# conservative VMEM budget for one frame's working set
_VMEM_LIMIT_ELEMS = 240 * 128 * 64


def _lrelu(u):
    # compare in f32: Mosaic lacks 16-bit vector comparisons on this target
    pos = u.astype(jnp.float32) > 0.0
    return jnp.where(pos, u, jnp.asarray(NEG_SLOPE, u.dtype) * u), pos


def _shift(v, dx, dy):
    """Neighbour value at (y+dy, x+dx); v: (..., Y, X).  Static slice+concat
    (Mosaic's rotate only handles 32-bit types); wrap killed by masks."""
    if dx == 1:
        v = jnp.concatenate([v[..., 1:], v[..., :1]], axis=-1)
    elif dx == -1:
        v = jnp.concatenate([v[..., -1:], v[..., :-1]], axis=-1)
    if dy == 1:
        v = jnp.concatenate([v[..., 1:, :], v[..., :1, :]], axis=-2)
    elif dy == -1:
        v = jnp.concatenate([v[..., -1:, :], v[..., :-1, :]], axis=-2)
    return v


def _masks_yx(Y, X):
    """Per-slot validity masks, bool (Y, X) maps."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    out = []
    for dx, dy in _SHIFTS:
        m = jnp.ones((Y, X), jnp.float32)
        if dx == 1:
            m = jnp.where(cols == X - 1, 0.0, m)
        elif dx == -1:
            m = jnp.where(cols == 0, 0.0, m)
        if dy == 1:
            m = jnp.where(rows == Y - 1, 0.0, m)
        elif dy == -1:
            m = jnp.where(rows == 0, 0.0, m)
        out.append(m > 0)
    return out


def _softmax_maps(logits, masks):
    """Per-slot masked softmax over 5 (Y, X) f32 maps -> alphas."""
    neg = jnp.float32(-jnp.inf)
    masked = [jnp.where(m, lg, neg) for lg, m in zip(logits, masks)]
    m = functools.reduce(jnp.maximum, masked)
    ws = [jnp.where(mk, jnp.exp(lg - m), 0.0) for lg, mk in zip(masked, masks)]
    denom = functools.reduce(jnp.add, ws)
    return [w / denom for w in ws]


def _chunk_ranges(heads, cdim, f_chunk):
    """Static (head, channel-offset, size) chunks, never straddling heads."""
    out = []
    for h in range(heads):
        o = 0
        while o < cdim:
            c = min(f_chunk, cdim - o)
            out.append((h, h * cdim + o, c))
            o += c
    return out


def _fwd_kernel(xl_ref, xr_ref, att_ref, out_ref, *, heads, cdim, f_chunk):
    # refs: (1, F, Y, X) channels-first; att_ref: (1, F)
    F, Y, X = xl_ref.shape[1], xl_ref.shape[2], xl_ref.shape[3]
    cd = xl_ref.dtype
    masks = _masks_yx(Y, X)
    chunks = _chunk_ranges(heads, cdim, f_chunk)

    # phase A: accumulate per-slot, per-head logit maps over channel chunks.
    # Heads live in PYTHON lists of (Y, X) maps — a (H, Y, X) array indexed
    # at h would lower `.at[h].add` to scatter-add, which Mosaic TC lacks.
    logits = [[jnp.zeros((Y, X), jnp.float32) for _ in range(heads)] for _ in _SHIFTS]
    for h, off, sz in chunks:
        xl_c = xl_ref[0, pl.ds(off, sz)]
        xr_c = xr_ref[0, pl.ds(off, sz)]
        for si, (dx, dy) in enumerate(_SHIFTS):
            u, _ = _lrelu(xr_c + _shift(xl_c, dx, dy))
            u32 = u.astype(jnp.float32)
            # att applied as per-channel SMEM scalars: a (F,)->(F,1,1)
            # broadcast is a lane->outer transpose Mosaic cannot lower
            part = functools.reduce(
                jnp.add, [u32[f] * att_ref[0, off + f] for f in range(sz)]
            )
            logits[si][h] = logits[si][h] + part

    # phase B: masked softmax over slots (tiny (Y, X) maps), per head
    alphas = [
        _softmax_maps([logits[si][h] for si in range(len(_SHIFTS))], masks)
        for h in range(heads)
    ]

    # phase C: out = sum_s alpha_s * v_s, chunk by chunk
    for h, off, sz in chunks:
        xl_c = xl_ref[0, pl.ds(off, sz)]
        acc = jnp.zeros((sz, Y, X), jnp.float32)
        for si, (dx, dy) in enumerate(_SHIFTS):
            acc = acc + alphas[h][si][None] * _shift(xl_c, dx, dy).astype(jnp.float32)
        out_ref[0, pl.ds(off, sz)] = acc.astype(out_ref.dtype)


def _bwd_kernel(xl_ref, xr_ref, att_ref, g_ref, dxl_ref, dxr_ref, datt_ref,
                *, heads, cdim, f_chunk):
    F, Y, X = xl_ref.shape[1], xl_ref.shape[2], xl_ref.shape[3]
    cd = xl_ref.dtype
    masks = _masks_yx(Y, X)
    chunks = _chunk_ranges(heads, cdim, f_chunk)
    for f in range(F):
        datt_ref[0, 0, f] = jnp.float32(0.0)

    # phase A: logit and g.v maps (python head lists — see _fwd_kernel note)
    logits = [[jnp.zeros((Y, X), jnp.float32) for _ in range(heads)] for _ in _SHIFTS]
    gvs = [[jnp.zeros((Y, X), jnp.float32) for _ in range(heads)] for _ in _SHIFTS]
    for h, off, sz in chunks:
        xl_c = xl_ref[0, pl.ds(off, sz)]
        xr_c = xr_ref[0, pl.ds(off, sz)]
        g_c = g_ref[0, pl.ds(off, sz)].astype(cd)
        for si, (dx, dy) in enumerate(_SHIFTS):
            v = _shift(xl_c, dx, dy)
            u, _ = _lrelu(xr_c + v)
            u32 = u.astype(jnp.float32)
            lg = functools.reduce(
                jnp.add, [u32[f] * att_ref[0, off + f] for f in range(sz)]
            )
            gv = jnp.sum((g_c * v).astype(jnp.float32), axis=0)
            logits[si][h] = logits[si][h] + lg
            gvs[si][h] = gvs[si][h] + gv

    # phase B: alpha and dlogit maps, per head
    alphas, dlogits = [], []
    for h in range(heads):
        al_h = _softmax_maps([logits[si][h] for si in range(len(_SHIFTS))], masks)
        gv_h = [gvs[si][h] for si in range(len(_SHIFTS))]
        gv_mean = functools.reduce(jnp.add, [a * gv for a, gv in zip(al_h, gv_h)])
        alphas.append(al_h)
        dlogits.append([a * (gv - gv_mean) for a, gv in zip(al_h, gv_h)])

    # phase C: input/parameter gradients, chunk by chunk
    for h, off, sz in chunks:
        xl_c = xl_ref[0, pl.ds(off, sz)]
        xr_c = xr_ref[0, pl.ds(off, sz)]
        g_c = g_ref[0, pl.ds(off, sz)].astype(jnp.float32)
        acc_dxr = [jnp.zeros((Y, X), jnp.float32) for _ in range(sz)]
        acc_dxl = [jnp.zeros((Y, X), jnp.float32) for _ in range(sz)]
        for si, (dx, dy) in enumerate(_SHIFTS):
            v = _shift(xl_c, dx, dy)
            u, pos = _lrelu(xr_c + v)
            u32 = u.astype(jnp.float32)
            du = jnp.where(pos, 1.0, jnp.float32(NEG_SLOPE))
            dl = dlogits[h][si]  # (Y, X) f32
            al = alphas[h][si]
            for f in range(sz):
                chain_f = dl * att_ref[0, off + f] * du[f]
                acc_dxr[f] = acc_dxr[f] + chain_f
                # contribution lands at the SOURCE pixel: reverse shift;
                # invalid slots have alpha = dlogit = 0, so wraps stay zero
                contrib_f = al * g_c[f] + chain_f
                acc_dxl[f] = acc_dxl[f] + _shift(contrib_f, -dx, -dy)
                datt_ref[0, 0, off + f] = datt_ref[0, 0, off + f] + jnp.sum(dl * u32[f])
        dxr_ref[0, pl.ds(off, sz)] = jnp.stack(acc_dxr, axis=0).astype(dxr_ref.dtype)
        dxl_ref[0, pl.ds(off, sz)] = jnp.stack(acc_dxl, axis=0).astype(dxl_ref.dtype)


def _to_cf(x):
    """(Bf, X, Y, F) -> (Bf, F, Y, X) channels-first (XLA layout pass)."""
    return jnp.transpose(x, (0, 3, 2, 1))


def _from_cf(x):
    return jnp.transpose(x, (0, 3, 2, 1))


def _call_fwd(xl, xr, att, heads, cdim, interpret=False):
    Bf, X, Y, F = xl.shape
    frame = pl.BlockSpec((1, F, Y, X), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    att_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, cdim=cdim, f_chunk=_F_CHUNK),
        grid=(Bf,),
        in_specs=[frame, frame, att_spec],
        out_specs=frame,
        out_shape=jax.ShapeDtypeStruct((Bf, F, Y, X), xl.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_to_cf(xl), _to_cf(xr), att.reshape(1, heads * cdim))
    return _from_cf(out)


def _call_bwd(xl, xr, att, g, heads, cdim, interpret=False):
    Bf, X, Y, F = xl.shape
    frame = pl.BlockSpec((1, F, Y, X), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    att_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dxl, dxr, datt = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, cdim=cdim, f_chunk=_F_CHUNK),
        grid=(Bf,),
        in_specs=[frame, frame, att_spec, frame],
        out_specs=(
            frame,
            frame,
            pl.BlockSpec((1, 1, F), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bf, F, Y, X), xl.dtype),
            jax.ShapeDtypeStruct((Bf, F, Y, X), xl.dtype),
            jax.ShapeDtypeStruct((Bf, 1, F), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_to_cf(xl), _to_cf(xr), att.reshape(1, heads * cdim), _to_cf(g))
    return _from_cf(dxl), _from_cf(dxr), datt.sum(axis=(0, 1)).reshape(heads, cdim)


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


def _xla_slot_attention(xl, xr, att, heads, cdim):
    """Dense XLA fallback (same math; used below the batch threshold)."""
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


import os as _os

# Fused-backward rollout: the channels-first kernels above are the first
# formulation that both lowers AND wins at production shapes on this
# toolchain; FLUID_GNN_FUSED_BWD=0 opts back to the XLA-recompute backward.
_USE_FUSED_BWD = _os.environ.get("FLUID_GNN_FUSED_BWD", "1") != "0"


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


def supported(x_shape, heads: int, cdim: int, min_frames: int = 16,
              ignore_heads: bool = False) -> bool:
    """Use the kernel only when the frame batch amortises launch overhead
    and one frame fits the single-program VMEM budget.  At small batches
    (e.g. the bs=1 rollout) XLA's fused elementwise path is faster.

    Multi-head is hardware-qualified (r3): heads live in python lists of
    (Y, X) maps — the earlier ``(H, Y, X).at[h].add`` formulation lowered
    to a scatter-add Mosaic TC lacks.  On-chip parity + timing at heads
    2/4: fwd+grad match XLA at bf16 tolerance, ~5x faster (BENCHMARKS.md);
    ``tools/tpu_smoke.py`` re-qualifies every benched round.
    ``ignore_heads`` is kept for API compatibility (now a no-op).
    """
    del ignore_heads
    X, Y, F = x_shape[-3], x_shape[-2], x_shape[-1]
    n_frames = 1
    for d in x_shape[:-3]:
        n_frames *= d
    return (
        n_frames >= min_frames
        and X * Y * F <= _VMEM_LIMIT_ELEMS
        and F == heads * cdim
    )
