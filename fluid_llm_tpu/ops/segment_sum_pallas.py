"""Pallas window-local segment-sum / segment-gather: scatter as MXU matmuls.

TPU equivalent of torch-scatter's CUDA ``scatter_sum`` fast path
(``eagle/Models/Base.py:3,44,82``).  XLA lowers ``segment_sum`` /
row-``gather`` to serialized per-row updates on the TPU: at EAGLE scale
(batch 4 x 20,369 edges -> 3,529 nodes, F=128) each scatter measures
**9.05 ms** and each gather ~10 ms for ~40 MB moved — two orders of
magnitude off the HBM roofline, and ~85 % of the MeshGraphNet device
step (BENCHMARKS.md "EAGLE-scale baseline stress").

The kernel's requirement is WINDOW-LOCALITY, not sortedness: each chunk
of ``CHUNK`` consecutive items must touch segment rows inside one
``window``-row band.  Sorted mesh edge lists satisfy it trivially
(``data/eagle_mesh.faces_to_edges`` sorts by ``edges[..., 0]``: mesh
degree ~6 ⇒ ~44 rows per 256 edges), and — the r5 extension — so do the
UNSORTED hot ids once the collate applies a static node relabeling:
``edges[..., 1]`` after an RCM/grid ordering bounds ``|u - v|`` by the
mesh bandwidth, and GraphViT cluster members after a cluster-major node
sort are consecutive (``data/reorder.py``).  Scatter then runs as a
dense one-hot contraction on the MXU::

    out[row0:row0+W] += onehot(ids - row0)ᵀ @ values[chunk]   # (W,C)@(C,F)

with ``row0`` the masked MIN of the chunk's in-range ids (for sorted ids
that equals the first id — the r4 behaviour).

Grid ``(n_stripes, n_chunks)``: the f-stripe (128 lanes) is outer so the
``(n_pad, 128)`` f32 output stripe stays RESIDENT in VMEM across all
chunk steps (~7 MB at 14k rows — gated on the ~16 MB VMEM budget) and is
written back to HBM exactly once.  The gather twin reads the resident
node stripe through the same window: ``out[chunk] = onehot @ window``.

Correct by construction, not by hope: the public wrappers compute a
runtime predicate (every chunk's in-range id span fits the window) and
``lax.cond`` between the kernel and the XLA twin — adversarial inputs
(hub nodes, genuinely scattered ids) silently take the XLA path.
Dropping semantics match ``jax.ops.segment_sum``: ids outside
``[0, num_segments)`` contribute nothing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # edges per grid step
WINDOW = 512  # default node-row window per chunk (mesh chunks span ~44 rows)
WINDOW_CHOICES = (512, 1024, 2048)  # static sizes the collate may pick from
LANE = 128  # feature stripe width
_VMEM_ROWS_MAX = 20480  # resident stripe budget: rows * 128 * 4 B ≤ ~10 MB

# MXU passes for the one-hot contraction.  Precision.DEFAULT runs the
# f32 dot as ONE bf16 pass — the VALUES get truncated (2.1e-3 rel err
# measured on chip).  Precision.HIGHEST fixes that at 6 passes but costs
# 14x (14.8 vs 1.07 ms/call at EAGLE scale), and Mosaic rejects
# Precision.HIGH outright.  The right decomposition is manual: the
# one-hot operand is EXACTLY representable in bf16, so only the values
# need splitting into bf16 limbs — K passes recover ~8K mantissa bits.
# K=3 (default) is f32-exact (3x8=24 bits covers the f32 mantissa;
# matches HIGHEST at ~4.7x cheaper, and passes the 1e-5/1e-6 unit and
# smoke gates).  K=2 ≈ 1e-5 rel err at ~2/3 the cost — fails the repo's
# own gates, opt-in only.  Override with FLUID_SEGSUM_PASSES=1|2|3.
_PASSES = int(os.environ.get("FLUID_SEGSUM_PASSES", "3"))


def _onehot_dot(oh, vals, dimension_numbers):
    """dot_general(one-hot bool, f32 values) via bf16 value limbs.

    bf16 values need NO limb decomposition — one bf16 MXU pass with f32
    accumulation is exact (the one-hot is exact in bf16, each product is
    a plain copy of the value) — so the bf16 compute mode pays 1/3 of the
    f32 path's MXU passes."""
    oh16 = oh.astype(jnp.bfloat16)
    if vals.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            oh16, vals, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )
    rem = vals.astype(jnp.float32)
    acc = None
    for _ in range(max(_PASSES, 1)):
        limb = rem.astype(jnp.bfloat16)
        rem = rem - limb.astype(jnp.float32)
        part = jax.lax.dot_general(
            oh16, limb, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chunk_row0(ids2, n_seg: int, n_pad: int, window: int):
    """Per-chunk window starts, computed OUTSIDE the kernel as one
    vectorized XLA reduce: the masked MIN of each chunk's in-range ids,
    floored to the sublane tile and clamped so
    ``[row0, row0+window)`` stays inside the padded rows.  Using the min
    (not the first id) is what frees the kernel from any sortedness
    requirement — only window-locality.  Fed to the kernel through SMEM:
    an in-kernel vector-min + scalar extraction measured ~18 µs of
    pipeline stall PER CHUNK on chip (5.9 vs 0.35 ms/call at EAGLE
    scale), wiping out the kernel win."""
    w = ids2[:, 0]  # (ng, C)
    valid = (w >= 0) & (w < n_seg)
    # floor to 16: the sublane tile of the WIDEST dtype the kernels load
    # through a dynamic window (bf16 node tables tile as (16, 128))
    row0 = (jnp.min(jnp.where(valid, w, jnp.int32(2**30)), axis=1) // 16) * 16
    row0 = jnp.clip(row0, 0, n_pad - window)
    # (ng, 1, 1): Mosaic requires the last two block dims to equal the
    # array dims for SMEM blocks
    return row0.astype(jnp.int32).reshape(-1, 1, 1)


def _scatter_kernel(row0_ref, ids_ref, vals_ref, o_ref, *, n_seg: int,
                    window: int):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    ids = ids_ref[0]  # (1, C) int32 (the ref block is (1, 1, C))
    # _chunk_row0 already floors to 16, but Mosaic can't see through an
    # opaque SMEM scalar — re-floor in-kernel (numerically a no-op) so the
    # dynamic-slice start is PROVABLY sublane-aligned for (16, 128) tiles
    row0 = (row0_ref[0, 0, 0] // 16) * 16
    iota = jax.lax.broadcasted_iota(jnp.int32, (window, ids.shape[1]), 0)
    oh = (iota == (ids - row0)) & (ids >= 0) & (ids < n_seg)
    part = _onehot_dot(oh, vals_ref[...], (((1,), (0,)), ((), ())))
    o_ref[pl.ds(row0, window), :] += part


def _expand_kernel(row0_ref, ids_ref, nodes_ref, o_ref, *, n_seg: int,
                   window: int):
    ids = ids_ref[0]  # (1, C) (the ref block is (1, 1, C))
    row0 = (row0_ref[0, 0, 0] // 16) * 16  # see _scatter_kernel: Mosaic alignment proof
    iota = jax.lax.broadcasted_iota(jnp.int32, (window, ids.shape[1]), 0)
    oh = (iota == (ids - row0)) & (ids >= 0) & (ids < n_seg)
    win = nodes_ref[pl.ds(row0, window), :]
    # contract the window axis: (W,C)x(W,F)->(C,F); the cast to the output
    # dtype is EXACT for bf16 nodes (each f32 MXU result is a plain copy of
    # one bf16 value) and halves the HBM write — the gather output is the
    # dominant byte stream at EAGLE scale (42 MB/call f32)
    out = _onehot_dot(oh, win, (((0,), (0,)), ((), ())))
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_seg", "n_pad", "interpret", "window"))
def _scatter_call(ids2, vals2, n_seg: int, n_pad: int, interpret: bool,
                  window: int = WINDOW):
    ng = ids2.shape[0]
    mp, fp = vals2.shape
    row0s = _chunk_row0(ids2, n_seg, n_pad, window)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_seg=n_seg, window=window),
        grid=(fp // LANE, ng),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda f, g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            # ids ride as (ng, 1, C): a (1, 1, C) block satisfies Mosaic's
            # last-two-dims rule by matching the full array extents
            pl.BlockSpec((1, 1, CHUNK), lambda f, g: (g, 0, 0)),
            pl.BlockSpec((CHUNK, LANE), lambda f, g: (g, f)),
        ],
        out_specs=pl.BlockSpec((n_pad, LANE), lambda f, g: (0, f)),
        out_shape=jax.ShapeDtypeStruct((n_pad, fp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row0s, ids2, vals2)
    return out


@functools.partial(jax.jit, static_argnames=("n_seg", "interpret", "window"))
def _expand_call(ids2, nodes2, n_seg: int, interpret: bool,
                 window: int = WINDOW):
    ng = ids2.shape[0]
    n_pad, fp = nodes2.shape
    row0s = _chunk_row0(ids2, n_seg, n_pad, window)
    out = pl.pallas_call(
        functools.partial(_expand_kernel, n_seg=n_seg, window=window),
        grid=(fp // LANE, ng),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda f, g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda f, g: (g, 0, 0)),
            pl.BlockSpec((n_pad, LANE), lambda f, g: (0, f)),
        ],
        out_specs=pl.BlockSpec((CHUNK, LANE), lambda f, g: (g, f)),
        # gathers of bf16 node tables come back bf16 (exact — see kernel)
        out_shape=jax.ShapeDtypeStruct(
            (ng * CHUNK, fp),
            nodes2.dtype if nodes2.dtype == jnp.bfloat16 else jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(row0s, ids2, nodes2)
    return out


def mode() -> str:
    """'auto' (kernel on TPU), 'pallas' (force), 'xla' (off),
    'interpret' (kernel in the Pallas interpreter — CPU tests)."""
    return os.environ.get("FLUID_SEGSUM", "auto").lower()


def use_kernel(n_rows_total: int, m_total: int,
               window: int = WINDOW) -> tuple[bool, bool]:
    """(use, interpret) for a flattened (segments=n_rows_total,
    items=m_total) problem on this backend."""
    env = mode()
    n_pad = _round_up(max(n_rows_total + 8, window), LANE)
    if env == "xla" or n_pad > _VMEM_ROWS_MAX or m_total < CHUNK:
        return False, False
    if env == "interpret":
        return True, True
    if env == "pallas":
        return True, False
    return jax.default_backend() == "tpu", False


def host_kernel_ok(ids: np.ndarray, n_per_batch: int,
                   window: int = WINDOW) -> bool:
    """NumPy mirror of the kernel predicate for a HOST batch of ids
    (..., E): after batch-major flattening with per-row offsets, every
    CHUNK's span of IN-RANGE ids fits the window (ids outside
    ``[0, n_per_batch)`` are dropped by both branches and ignored here).
    Sortedness is NOT required — only window-locality.  The collate
    asserts this per batch — the loud guard behind the static
    ``windowed=True`` contract at the model call sites."""
    b = int(np.prod(ids.shape[:-1])) if ids.ndim > 1 else 1
    ids2 = ids.reshape(b, -1).astype(np.int64)
    valid = (ids2 >= 0) & (ids2 < n_per_batch)
    flat = (ids2 + (np.arange(b, dtype=np.int64) * n_per_batch)[:, None]).reshape(-1)
    vflat = valid.reshape(-1)
    mp = _round_up(flat.shape[0], CHUNK)
    pad = mp - flat.shape[0]
    flat = np.pad(flat, (0, pad), mode="edge")
    vflat = np.pad(vflat, (0, pad), mode="edge")
    chunks = flat.reshape(-1, CHUNK)
    vchunks = vflat.reshape(-1, CHUNK)
    lo = np.where(vchunks, chunks, np.int64(2**60)).min(axis=1)
    hi = np.where(vchunks, chunks, np.int64(-(2**60))).max(axis=1)
    span = np.where(vchunks.any(axis=1), hi - lo, 0)
    return bool(np.all(span <= window - 16))


def min_window(ids: np.ndarray, n_per_batch: int) -> int:
    """Smallest WINDOW_CHOICES size whose span contract ``ids`` satisfies,
    or 0 if none does (→ the call site must use the XLA path).  Host-side
    helper for the collate's static dispatch decision."""
    for w in WINDOW_CHOICES:
        if host_kernel_ok(ids, n_per_batch, window=w):
            return w
    return 0


def _flatten(idx, n_per_batch: int):
    """idx (..., E) -> globally-offset flat int32 ids (B*E,), B.

    Per-batch out-of-range ids (e.g. ``id == n_per_batch``) are mapped to
    a NEGATIVE sentinel instead of offset — a raw offset would alias them
    into the NEXT batch element's segment 0 on the kernel path while the
    vmapped XLA twin drops them (ADVICE r4).  Negative ids are dropped /
    zero-row'd identically by both branches."""
    b = int(np.prod(idx.shape[:-1])) if idx.ndim > 1 else 1
    idx2 = idx.reshape(b, -1).astype(jnp.int32)
    off = (jnp.arange(b, dtype=jnp.int32) * n_per_batch)[:, None]
    ok = (idx2 >= 0) & (idx2 < n_per_batch)
    return jnp.where(ok, idx2 + off, jnp.int32(-(2**30))).reshape(-1), b


def _prep_ids(ids_flat, n_seg: int, window: int):
    """Pad flat ids to a CHUNK multiple (edge mode — keeps spans tight)
    and compute the kernel-eligibility predicate: every chunk's span of
    in-range ids fits the window (no sortedness requirement)."""
    m = ids_flat.shape[0]
    mp = _round_up(m, CHUNK)
    ids_p = jnp.pad(ids_flat, (0, mp - m), mode="edge")
    ids2 = ids_p.reshape(mp // CHUNK, 1, CHUNK)
    w = ids2[:, 0]
    valid = (w >= 0) & (w < n_seg)
    # int32-safe sentinels: empty chunks get hi-lo = -1 - 2**30 < 0 (pass)
    lo = jnp.min(jnp.where(valid, w, jnp.int32(2**30)), axis=1)
    hi = jnp.max(jnp.where(valid, w, jnp.int32(-1)), axis=1)
    fits = jnp.all(hi - lo <= window - 16)
    return ids2, fits, m, mp


def _pad_feat(x2, mp_rows: int):
    m, f = x2.shape
    fp = _round_up(max(f, 1), LANE)
    return jnp.pad(x2, ((0, mp_rows - m), (0, fp - f)))


def segment_sum_flat(values2, ids_flat, num_segments: int,
                     interpret: bool = False, assume_windowed: bool = False,
                     window: int = WINDOW):
    """values2 (M, F) summed into (num_segments, F) by flat ids.

    ``assume_windowed=False``: a runtime predicate (every chunk's span of
    in-range ids fits the window) picks kernel vs XLA via ``lax.cond`` —
    always correct, but the TPU conditional COPIES its big operands
    (~8 ms/call at EAGLE scale, measured: it ate the entire kernel win).
    ``assume_windowed=True``: the kernel is called directly with no cond
    — for call sites with a static locality contract (dataloader-sorted
    ``edges[..., 0]``, RCM-banded ``edges[..., 1]``, cluster-major node
    order; the collate asserts it on the host per batch)."""
    m, f = values2.shape
    ids2, pred, _, mp = _prep_ids(ids_flat, num_segments, window)
    n_pad = _round_up(max(num_segments + 8, window), LANE)
    vals_p = _pad_feat(values2, mp)

    def kern(v, i):
        # multi-stripe grids keep TWO (n_pad, 128) output blocks alive
        # (double buffering across the f dimension): 16.33 MB at EAGLE
        # scale for (14208, 256) f32 — over the ~16 MB scoped-VMEM budget.
        # Kernel time is LAUNCH-bound (~0.3 ms/exec floor on this
        # platform), so prefer ONE call when the resident pair fits and
        # fall back to per-128-lane calls when it doesn't.
        resident = 2 * n_pad * LANE * 4  # o_ref stays f32 (accumulation)
        if v.shape[1] == LANE or resident <= 12 * 2**20:
            out = _scatter_call(i, v, num_segments, n_pad, interpret,
                                window=window)
        else:
            outs = [
                _scatter_call(i, jax.lax.slice_in_dim(v, s, s + LANE, axis=1),
                              num_segments, n_pad, interpret, window=window)
                for s in range(0, v.shape[1], LANE)
            ]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return out[:num_segments, :f].astype(values2.dtype)

    def xla(v, i):
        return jax.ops.segment_sum(
            v[:m, :f], ids_flat, num_segments=num_segments
        ).astype(values2.dtype)

    if assume_windowed:
        return kern(vals_p, ids2)
    return jax.lax.cond(pred, kern, xla, vals_p, ids2)


def gather_flat(nodes2, ids_flat, interpret: bool = False,
                assume_windowed: bool = False, window: int = WINDOW):
    """rows (M, F) = nodes2[ids_flat] with zeros for out-of-range ids;
    kernel when the window predicate holds (or is statically promised
    via ``assume_windowed`` — see ``segment_sum_flat``)."""
    n, f = nodes2.shape
    ids2, pred, m, _ = _prep_ids(ids_flat, n, window)
    n_pad = _round_up(max(n + 8, window), LANE)
    nodes_p = _pad_feat(nodes2, n_pad)

    def kern(nd, i):
        # single launch when the double-buffered node stripes fit VMEM
        # (always for bf16 tables at EAGLE scale); per-stripe otherwise —
        # see segment_sum_flat (launch-bound regime)
        resident = 2 * n_pad * LANE * nd.dtype.itemsize
        if nd.shape[1] == LANE or resident <= 12 * 2**20:
            out = _expand_call(i, nd, n, interpret, window=window)
        else:
            outs = [
                _expand_call(i, jax.lax.slice_in_dim(nd, s, s + LANE, axis=1),
                             n, interpret, window=window)
                for s in range(0, nd.shape[1], LANE)
            ]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return out[:m, :f].astype(nodes2.dtype)

    def xla(nd, i):
        # same semantics as the kernel: out-of-range ids -> zero rows
        # (the VJP transpose of segment_sum's dropping)
        rows = jnp.take(nd[:n, :f], jnp.clip(ids_flat, 0, n - 1), axis=0)
        ok = (ids_flat >= 0) & (ids_flat < n)
        return jnp.where(ok[:, None], rows, 0).astype(nodes2.dtype)

    if assume_windowed:
        return kern(nodes_p, ids2)
    return jax.lax.cond(pred, kern, xla, nodes_p, ids2)
