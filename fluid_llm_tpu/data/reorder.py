"""Static node relabeling that makes the UNSORTED hot ids window-local.

The Pallas segment kernels (``ops/segment_sum_pallas``) need each CHUNK of
consecutive ids to touch one small band of rows.  Edge lists sorted by the
aggregation column get that for free; the two remaining scatter-bound id
streams in the EAGLE baselines do not (VERDICT r4 weak #4):

- ``edges[..., 1]`` — the reverse gather in every GNN block
  (``eagle/Models/Base.py:44``) and its backward scatter.  After a reverse
  Cuthill-McKee relabeling of the mesh nodes, ``|u - v|`` for every edge is
  bounded by the mesh bandwidth (~O(sqrt(N)) for planar meshes), so chunks
  of edges sorted by column 0 touch column-1 rows inside a small band.
- GraphViT cluster member ids (``eagle/Models/GraphViT.py:98-153``) — the
  pooling gathers and the retrieve scatter.  After a CLUSTER-MAJOR node
  sort (clusters themselves RCM-ordered on their adjacency graph, so
  edge locality survives), each cluster's members are consecutive new ids
  and the flattened member table is near-sorted.

Everything here is a STATIC host-side permutation per trajectory (meshes
and kmeans tables are fixed per trajectory), cached by topology hash and
applied sample-wide — positions, states, types, faces, edge endpoints and
cluster tables all relabel consistently, so the models (permutation-
equivariant by construction) compute the same physics; the collate then
VERIFIES the window contract per batch and only then sets the static
kernel-dispatch flags.  Within-cluster member order is normalised to
ascending node id — the reference's GRU pooling consumes whatever order
the kmeans file stored (``GraphViT.py:104-117``), which is equally
arbitrary; a model trains/evals consistently under either.
"""

from __future__ import annotations

import hashlib

import numpy as np

from fluid_llm_tpu.data.eagle_mesh import GraphSample

_CACHE: dict[bytes, np.ndarray] = {}
_CACHE_CAP = 256


def _digest(*arrays) -> bytes:
    h = hashlib.blake2b(digest_size=16)
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.digest()


def rcm_node_order(edges: np.ndarray, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee order (new->old) of the mesh nodes; bounds the
    edge bandwidth so ``edges[..., 1]`` chunks stay window-local."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    e = edges[(edges[:, 0] >= 0) & (edges[:, 0] < n)
              & (edges[:, 1] >= 0) & (edges[:, 1] < n)]
    adj = coo_matrix(
        (np.ones(len(e), np.int8), (e[:, 0], e[:, 1])), shape=(n, n)
    ).tocsr()
    order = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True),
                       dtype=np.int64)
    return order


def cluster_major_order(cluster0: np.ndarray, edges: np.ndarray,
                        n: int) -> np.ndarray:
    """Node order (new->old): nodes grouped by cluster, clusters RCM-ordered
    on THEIR adjacency graph (two clusters are adjacent when a mesh edge
    links them), members within a cluster by ascending old id.  Keeps both
    the member table AND the relabeled edge list window-local."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    C = cluster0.shape[0]
    node2cluster = np.full(n, C, np.int64)  # unassigned -> end
    for c in range(C):
        m = cluster0[c]
        m = m[(m >= 0) & (m < n)]
        node2cluster[m] = c

    cu = node2cluster[np.clip(edges[:, 0], 0, n - 1)]
    cv = node2cluster[np.clip(edges[:, 1], 0, n - 1)]
    ok = (cu < C) & (cv < C)
    cadj = coo_matrix(
        (np.ones(ok.sum(), np.int8), (cu[ok], cv[ok])), shape=(C, C)
    ).tocsr()
    corder = np.asarray(reverse_cuthill_mckee(cadj, symmetric_mode=True),
                        dtype=np.int64)
    crank = np.empty(C + 1, np.int64)
    crank[corder] = np.arange(C)
    crank[C] = C

    key = crank[node2cluster]
    return np.lexsort((np.arange(n), key))


def _remap_cluster(cluster: np.ndarray, rank: np.ndarray, n: int) -> np.ndarray:
    """(T, C, K) member table -> new ids, members ascending per row (-1 pads
    trail), rows ordered by first member so the flattened table is
    near-sorted each step."""
    T, C, K = cluster.shape
    out = np.full_like(cluster, -1)
    big = np.int64(2**60)
    for t in range(T):
        cl = cluster[t]
        valid = (cl >= 0) & (cl < n)
        mapped = np.where(valid, rank[np.clip(cl, 0, n - 1)], big)
        mapped = np.sort(mapped, axis=1)  # pads (big) trail
        first = mapped[:, 0]  # empty rows -> big, trail after the row sort
        rows = np.argsort(first, kind="stable")
        mapped = mapped[rows]
        out[t] = np.where(mapped < big, mapped, -1)
    return out


def reorder_sample(sample: GraphSample, mode: str = "cluster") -> GraphSample:
    """Relabel one trajectory window with a locality-preserving node order.

    ``mode="cluster"``: cluster-major when a cluster table exists (RCM
    otherwise) — unlocks the member-table window contract, but costs a
    wider edge window (1024) and is a measured win only under bf16
    compute.  ``mode="rcm"``: RCM regardless of clusters — tight edge
    bands (512), cluster ops take the XLA path — the better f32 trade
    (BENCHMARKS "r5: window-local kernels").  Pure host-side; cached per
    topology."""
    n = sample.mesh_pos.shape[1]
    cl0 = (sample.cluster[0]
           if sample.cluster is not None and mode == "cluster" else None)
    key = _digest(sample.edges, *( [cl0] if cl0 is not None else [] ))
    order = _CACHE.get(key)
    if order is None:
        if cl0 is not None:
            order = cluster_major_order(np.asarray(cl0, np.int64),
                                        sample.edges.astype(np.int64), n)
        else:
            order = rcm_node_order(sample.edges.astype(np.int64), n)
        if len(_CACHE) >= _CACHE_CAP:
            _CACHE.clear()
        _CACHE[key] = order

    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)

    re = rank[sample.edges.astype(np.int64)]
    re = re[np.lexsort((re[:, 1], re[:, 0]))].astype(sample.edges.dtype)

    cluster = None
    if sample.cluster is not None:
        cluster = _remap_cluster(np.asarray(sample.cluster, np.int64), rank, n)

    faces = rank[sample.faces.astype(np.int64)] if sample.faces is not None else None
    return GraphSample(
        mesh_pos=sample.mesh_pos[:, order],
        edges=re,
        state=sample.state[:, order],
        node_type=sample.node_type[:, order],
        cluster=cluster,
        faces=faces,
    )
