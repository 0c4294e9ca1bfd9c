"""Batched segment/gather ops for mesh-graph message passing.

TPU-native replacement for torch-scatter's CUDA ``scatter_sum``
(``eagle/Models/Base.py:3,44,82``).  Two paths behind one API:

- **XLA** ``segment_sum`` / ``take_along_axis`` — always correct, but the
  TPU lowers both to serialized per-row updates (~9-10 ms per call at
  EAGLE scale; BENCHMARKS.md "EAGLE-scale baseline stress").
- **Pallas window-local kernels** (``ops/segment_sum_pallas``) — scatter
  and gather as chunked one-hot MXU contractions over a VMEM-resident
  stripe (20-30x faster per op on chip).

Dispatch is controlled by the static ``windowed`` argument:

- ``windowed=True`` — the call site PROMISES every CHUNK of consecutive
  ids touches segment rows inside one ``window``-row band.  Satisfied by
  ids sorted by the aggregation column (``data/eagle_mesh.faces_to_edges``
  sorts ``edges[..., 0]``), and — after the collate's static node
  relabeling (``data/reorder.py``) — by ``edges[..., 1]`` (RCM-bounded
  bandwidth) and GraphViT cluster members (cluster-major node order).
  The kernel is called with no runtime branch; the collate asserts the
  contract on the host per batch.
- ``windowed=False`` — straight to XLA (ids with no locality guarantee).
- ``windowed="auto"`` (default) — a runtime span predicate picks the
  branch via ``lax.cond``.  Always safe, but measured on chip the TPU
  conditional copies its big operands (~8 ms/call at EAGLE scale), which
  cancels the kernel win — hence the static contract for the hot sites.

``window`` (static, default 512) is the band width; the collate picks the
smallest of ``segment_sum_pallas.WINDOW_CHOICES`` that the data satisfies.

Both ops carry a ``custom_vjp`` so the backward rides the same dispatch:
d(segment_sum)/dvalues is a gather by the SAME ids, d(gather)/dnodes is a
segment_sum by them.  (Consequence: no forward-mode / double-backward
through these ops — nothing in the repo needs it.)

Everything is static-shape (ghost-padded edges, see ``data/eagle_mesh``).
Gather semantics for out-of-range ids are ZERO rows on EVERY path (the
VJP transpose of segment_sum's dropping) — windowed call sites use ids
``>= num_nodes`` as droppable ghosts; the XLA fallback masks them too so
CPU tests and the kernel agree bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.ops import segment_sum_pallas as _ssp


def _feat_shape(x, n_batch_dims: int):
    feat = x.shape[n_batch_dims + 1:]
    return feat, int(np.prod(feat)) if feat else 1


def _segment_sum_impl(values, idx, num_nodes: int, windowed, window: int):
    """values: (..., E, *F); idx: (..., E) int -> (..., N, *F)."""
    bdims = idx.ndim - 1
    feat, f = _feat_shape(values, bdims)
    b = int(np.prod(idx.shape[:-1])) if bdims else 1
    e = idx.shape[-1]
    use, interp = _ssp.use_kernel(b * num_nodes, b * e, window)
    if not use or windowed is False:
        def one(v, i):
            return jax.ops.segment_sum(
                v.reshape(e, f), i, num_segments=num_nodes
            ).reshape((num_nodes,) + feat)

        out = one(values, idx) if not bdims else jax.vmap(one)(
            values.reshape((b, e) + feat), idx.reshape(b, e)
        )
        return out.reshape(idx.shape[:-1] + (num_nodes,) + feat)

    ids_flat, _ = _ssp._flatten(idx, num_nodes)
    out = _ssp.segment_sum_flat(
        values.reshape(b * e, f), ids_flat, b * num_nodes, interp,
        assume_windowed=(windowed is True), window=window,
    )
    return out.reshape(idx.shape[:-1] + (num_nodes,) + feat)


def _gather_impl(V, idx, windowed, window: int):
    """V: (..., N, F); idx: (..., E) int -> (..., E, F); out-of-range ids
    yield zero rows on every path."""
    bdims = idx.ndim - 1
    n, f = V.shape[-2], V.shape[-1]
    b = int(np.prod(idx.shape[:-1])) if bdims else 1
    e = idx.shape[-1]
    use, interp = _ssp.use_kernel(b * n, b * e, window)
    if not use or windowed is False:
        ok = (idx >= 0) & (idx < n)
        rows = jnp.take_along_axis(
            V.reshape(idx.shape[:-1] + (n, f)),
            jnp.clip(idx, 0, n - 1)[..., None], axis=-2,
        )
        return jnp.where(ok[..., None], rows, 0)
    ids_flat, _ = _ssp._flatten(idx, n)
    out = _ssp.gather_flat(V.reshape(b * n, f), ids_flat, interp,
                           assume_windowed=(windowed is True), window=window)
    return out.reshape(idx.shape[:-1] + (e, f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def segment_sum_nodes(values: jnp.ndarray, idx: jnp.ndarray, num_nodes: int,
                      windowed="auto", window: int = _ssp.WINDOW) -> jnp.ndarray:
    """values: (B, E, *F); idx: (B, E) int -> (B, N, *F) summed per node.

    ``windowed``: True (static promise: every id CHUNK spans < ``window``
    rows — kernel, no branch), False (XLA), or "auto" (runtime cond).
    """
    return _segment_sum_impl(values, idx, num_nodes, windowed, window)


def _ss_fwd(values, idx, num_nodes, windowed, window):
    return (_segment_sum_impl(values, idx, num_nodes, windowed, window),
            (idx, values.shape))


def _ss_bwd(num_nodes, windowed, window, res, g):
    idx, vshape = res
    feat = vshape[idx.ndim:]
    gf = g.reshape(idx.shape[:-1] + (num_nodes, int(np.prod(feat)) if feat else 1))
    dvalues = _gather_impl(gf, idx, windowed, window).reshape(vshape)
    return dvalues, np.zeros(idx.shape, jax.dtypes.float0)


segment_sum_nodes.defvjp(_ss_fwd, _ss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_nodes(V: jnp.ndarray, idx: jnp.ndarray, windowed="auto",
                 window: int = _ssp.WINDOW) -> jnp.ndarray:
    """V: (B, N, F); idx: (B, E) int -> (B, E, F) (torch.gather dim=-2,
    except out-of-range ids give ZERO rows — droppable ghosts).

    ``windowed`` as in :func:`segment_sum_nodes`.
    """
    return _gather_impl(V, idx, windowed, window)


def _g_fwd(V, idx, windowed, window):
    return _gather_impl(V, idx, windowed, window), (idx, V.shape)


def _g_bwd(windowed, window, res, g):
    idx, vshape = res
    dV = _segment_sum_impl(g, idx, vshape[-2], windowed, window).reshape(vshape)
    return dV, np.zeros(idx.shape, jax.dtypes.float0)


gather_nodes.defvjp(_g_fwd, _g_bwd)
