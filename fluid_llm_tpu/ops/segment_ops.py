"""Batched segment/gather ops for mesh-graph message passing.

TPU-native replacement for torch-scatter's CUDA ``scatter_sum``
(``eagle/Models/Base.py:3,44,82``).  Two paths behind one API:

- **XLA** ``segment_sum`` / ``take_along_axis`` — always correct, but the
  TPU lowers both to serialized per-row updates (~9-10 ms per call at
  EAGLE scale; BENCHMARKS.md "EAGLE-scale baseline stress").
- **Pallas sorted kernels** (``ops/segment_sum_pallas``) — scatter and
  gather as chunked one-hot MXU contractions over a VMEM-resident
  stripe (20-30x faster per op on chip).

Dispatch is controlled by the static ``sorted`` argument:

- ``sorted=True`` — the call site PROMISES ids arrive sorted by the
  aggregation column (the dataloaders emit edges sorted by
  ``edges[..., 0]`` — ``data/eagle_mesh.faces_to_edges`` — and
  ``iterate_graph_batches`` asserts the full kernel predicate per batch
  on the host).  The kernel is called with no runtime branch.
- ``sorted=False`` — straight to XLA (cluster indices, ``edges[..., 1]``).
- ``sorted="auto"`` (default) — a runtime sorted/span predicate picks the
  branch via ``lax.cond``.  Always safe, but measured on chip the TPU
  conditional copies its big operands (~8 ms/call at EAGLE scale), which
  cancels the kernel win — hence the static contract for the hot sites.

Both ops carry a ``custom_vjp`` so the backward rides the same dispatch:
d(segment_sum)/dvalues is a gather by the SAME sorted ids,
d(gather)/dnodes is a segment_sum by them.  (Consequence: no forward-mode
/ double-backward through these ops — nothing in the repo needs it.)

Everything is static-shape (ghost-padded edges, see ``data/eagle_mesh``).
Gather semantics for out-of-range ids are ZERO rows (the VJP transpose of
segment_sum's dropping) — every call site indexes in range (ghosts live
at a real padded slot ``n_max``).
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


def _segment_sum_impl(values, idx, num_nodes: int, sorted):
    """values: (..., E, *F); idx: (..., E) int -> (..., N, *F)."""
    bdims = idx.ndim - 1
    feat, f = _feat_shape(values, bdims)
    b = int(np.prod(idx.shape[:-1])) if bdims else 1
    e = idx.shape[-1]
    use, interp = _ssp.use_kernel(b * num_nodes, b * e)
    if not use or sorted is False:
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
        assume_sorted=(sorted is True),
    )
    return out.reshape(idx.shape[:-1] + (num_nodes,) + feat)


def _gather_impl(V, idx, sorted):
    """V: (..., N, F); idx: (..., E) int -> (..., E, F)."""
    bdims = idx.ndim - 1
    n, f = V.shape[-2], V.shape[-1]
    b = int(np.prod(idx.shape[:-1])) if bdims else 1
    e = idx.shape[-1]
    use, interp = _ssp.use_kernel(b * n, b * e)
    if not use or sorted is False:
        return jnp.take_along_axis(
            V.reshape(idx.shape[:-1] + (n, f)), idx[..., None], axis=-2
        )
    ids_flat, _ = _ssp._flatten(idx, n)
    out = _ssp.gather_flat(V.reshape(b * n, f), ids_flat, interp,
                           assume_sorted=(sorted is True))
    return out.reshape(idx.shape[:-1] + (e, f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_nodes(values: jnp.ndarray, idx: jnp.ndarray, num_nodes: int,
                      sorted="auto") -> jnp.ndarray:
    """values: (B, E, *F); idx: (B, E) int -> (B, N, *F) summed per node.

    ``sorted``: True (static promise: ids sorted by the aggregation
    column — kernel, no branch), False (XLA), or "auto" (runtime cond).
    """
    return _segment_sum_impl(values, idx, num_nodes, sorted)


def _ss_fwd(values, idx, num_nodes, sorted):
    return _segment_sum_impl(values, idx, num_nodes, sorted), (idx, values.shape)


def _ss_bwd(num_nodes, sorted, res, g):
    idx, vshape = res
    feat = vshape[idx.ndim:]
    gf = g.reshape(idx.shape[:-1] + (num_nodes, int(np.prod(feat)) if feat else 1))
    dvalues = _gather_impl(gf, idx, sorted).reshape(vshape)
    return dvalues, np.zeros(idx.shape, jax.dtypes.float0)


segment_sum_nodes.defvjp(_ss_fwd, _ss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_nodes(V: jnp.ndarray, idx: jnp.ndarray, sorted="auto") -> jnp.ndarray:
    """V: (B, N, F); idx: (B, E) int -> (B, E, F) (torch.gather dim=-2).

    ``sorted`` as in :func:`segment_sum_nodes`.
    """
    return _gather_impl(V, idx, sorted)


def _g_fwd(V, idx, sorted):
    return _gather_impl(V, idx, sorted), (idx, V.shape)


def _g_bwd(sorted, res, g):
    idx, vshape = res
    dV = _segment_sum_impl(g, idx, vshape[-2], sorted).reshape(vshape)
    return dV, np.zeros(idx.shape, jax.dtypes.float0)


gather_nodes.defvjp(_g_fwd, _g_bwd)
