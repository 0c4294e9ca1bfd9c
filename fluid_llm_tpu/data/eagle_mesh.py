"""Graph datasets for the EAGLE-benchmark baselines + static-shape collate.

Equivalents of ``eagle/Dataloader/MGN.py`` (cylinder/airfoil pkl graphs),
``eagle/Dataloader/eagle.py`` (EAGLE drone npz) and the ghost-node padding
collates (``eagle/train_mgn.py:32-59``, ``eagle/train_graphvit.py:34-76``).

TPU-first: instead of padding each batch to *its* max (dynamic shapes ->
recompiles), the collate pads to dataset-wide bucket sizes so every batch
compiles once.  Ghost nodes sit at index ``N_max`` (one extra slot), ghost
edges point at that slot, and the real-node ``mask`` excludes ghosts from
losses — exactly the reference's masking semantics with static shapes.
"""

from __future__ import annotations

import os
import pickle
import re
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

# node-type codes (``eagle/Dataloader/MGN.py:10-14``)
NODE_NORMAL = 0
NODE_INPUT = 4
NODE_OUTPUT = 5
NODE_WALL = 6
NODE_DISABLE = 2

# fixed normalization stats, exactly as written in the reference — note the
# cylinder velocity/pressure stats appear swapped upstream
# (``MGN.py:108-123``); reproduced verbatim for parity.
MGN_PRESSURE_MEAN, MGN_PRESSURE_STD = (0.8845, -0.0002054), (0.5875, 0.1286)
MGN_VELOCITY_MEAN, MGN_VELOCITY_STD = (0.04064, 0.04064), (0.2924, 0.2924)
# EAGLE (``eagle.py:99-113``)
EAGLE_PRESSURE_MEAN, EAGLE_PRESSURE_STD = (-0.8322, 4.6050), (7.4013, 9.7232)
EAGLE_VELOCITY_MEAN, EAGLE_VELOCITY_STD = (-0.0015, 0.2211), (1.7970, 2.0258)
# Airfoil graph loader (``eagle/Dataloader/airfoil.py:78-90``) — note the
# reference computes means from (170.1, -1.183) but hardcodes the velocity
# stds to [50, 50] (NOT the measured 71.06/46.73); reproduced verbatim.
AIRFOIL_G_VELOCITY_MEAN, AIRFOIL_G_VELOCITY_STD = (170.1, -1.183), (50.0, 50.0)
AIRFOIL_G_PRESSURE_MEAN, AIRFOIL_G_PRESSURE_STD = (9.935e4, 9.935e4), (8964.0, 8964.0)


def natsorted(items):
    return sorted(items, key=lambda s: [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", s)])


def faces_to_edges(faces: np.ndarray) -> np.ndarray:
    """Triangles -> unique undirected edges, both directions
    (``MGN.py:163-174``).  faces: (F, 3) -> (E, 2) int32.

    The edge list is sorted by column 0 — the column every model
    aggregates and gathers at (``Base.py:44``; message passing is
    invariant to edge order).  Sorted ids are what lets
    ``ops/segment_sum_pallas`` replace the TPU's serialized scatter
    with MXU one-hot contractions; ghost padding appends ``n_max``
    self-loops (``collate_graphs``), which keeps the order sorted."""
    edges = np.concatenate([faces[:, :2], faces[:, 1:], faces[:, ::2]], axis=0)
    senders = edges.max(axis=-1)
    receivers = edges.min(axis=-1)
    packed = np.stack([senders, receivers], axis=-1)
    unique = np.unique(packed, axis=0)
    both = np.concatenate([unique, unique[:, ::-1]], axis=0).astype(np.int32)
    return both[np.lexsort((both[:, 1], both[:, 0]))]


@dataclass
class GraphSample:
    """One trajectory window, un-padded."""

    mesh_pos: np.ndarray  # (T, N, 2)
    edges: np.ndarray  # (E, 2) static topology
    state: np.ndarray  # (T, N, 4) = [Vx, Vy, P, P]
    node_type: np.ndarray  # (T, N, 9) one-hot
    cluster: Optional[np.ndarray] = None  # (T, C, K) int, -1 padded
    faces: Optional[np.ndarray] = None


def one_hot9(node_type: np.ndarray) -> np.ndarray:
    return np.eye(9, dtype=np.int32)[np.clip(node_type, 0, 8)]


class EagleMGNDataset:
    """Cylinder/airfoil pkl graphs (``eagle/Dataloader/MGN.py:17-137``)."""

    def __init__(
        self,
        data_path: str,
        mode: str = "train",
        window_length: int = 5,
        normalize: bool = False,
        with_cluster: bool = False,
        n_cluster: int = 10,
        seed: int = 1,
        max_steps: int = 600,
    ):
        assert mode in ("train", "valid", "test")
        self.fn = os.path.join(data_path, mode)
        self.files = natsorted(
            [os.path.join(r, f) for r, _, fs in os.walk(self.fn) for f in fs if f.endswith(".pkl")]
        )
        if not self.files:
            raise FileNotFoundError(f"No .pkl files under {self.fn}")
        self.mode = mode
        self.window_length = window_length
        self.normalize = normalize
        self.with_cluster = with_cluster
        self.n_cluster = n_cluster
        self.max_steps = max_steps
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.files)

    def _window_start(self) -> int:
        if self.window_length == self.max_steps:
            return 0
        if self.mode != "train":
            return 100  # fixed val/test start (``MGN.py:141-144``)
        return int(self._rng.integers(0, self.max_steps - self.window_length + 1))

    # normalization constants as class attrs so subclasses (airfoil) swap them
    VEL_MEAN, VEL_STD = MGN_VELOCITY_MEAN, MGN_VELOCITY_STD
    PRESS_MEAN, PRESS_STD = MGN_PRESSURE_MEAN, MGN_PRESSURE_STD

    def _filter_nodes(self, pos, node_type, vel, press, faces):
        """Optional spatial crop hook (airfoil loader); identity here."""
        return pos, node_type, vel, press, faces

    def __getitem__(self, item: int) -> GraphSample:
        with open(self.files[item], "rb") as f:
            data = pickle.load(f)
        t = self._window_start()
        T = self.window_length
        pos = np.asarray(data["mesh_pos"], np.float32)
        faces = np.asarray(data["cells"], np.int64)
        node_type = np.asarray(data["node_type"]).squeeze()
        vel = np.asarray(data["velocity"], np.float32)[t:t + T]
        press = np.asarray(data["pressure"], np.float32)[t:t + T]
        press = np.repeat(press, 2, axis=-1)  # (``MGN.py:154``)
        pos, node_type, vel, press, faces = self._filter_nodes(
            pos, node_type, vel, press, faces
        )

        if self.normalize:
            vel = (vel - np.asarray(self.VEL_MEAN, np.float32)) / np.asarray(self.VEL_STD, np.float32)
            press = (press - np.asarray(self.PRESS_MEAN, np.float32)) / np.asarray(self.PRESS_STD, np.float32)

        state = np.concatenate([vel, press], axis=-1)
        nt = np.repeat(one_hot9(node_type)[None], T, axis=0)
        mesh_pos = np.repeat(pos[None], T, axis=0)
        edges = faces_to_edges(faces)

        cluster = None
        if self.with_cluster:
            save_name = os.path.basename(self.files[item])[:-4]
            cpath = os.path.join(self.fn, f"constrained_kmeans_{self.n_cluster}_{save_name}.npy")
            cluster = np.load(cpath, mmap_mode="r")[t:t + T].copy().astype(np.int64)
        return GraphSample(mesh_pos=mesh_pos, edges=edges, state=state, node_type=nt,
                           cluster=cluster, faces=faces)


class AirfoilGraphDataset(EagleMGNDataset):
    """Airfoil pkl graphs for the graph baselines
    (``eagle/Dataloader/airfoil.py:17-172``).

    Same pkl layout as the MGN loader plus two airfoil-specific behaviours:
    the outer far-field region is cropped away (-0.5 < x < 2,
    -0.75 < y < 0.75; faces reindexed, ``airfoil.py:146-168``) and its own
    normalization constants apply (``airfoil.py:78-90`` — the velocity stds
    are hardcoded [50, 50] upstream, not the measured values; reproduced).
    """

    VEL_MEAN, VEL_STD = AIRFOIL_G_VELOCITY_MEAN, AIRFOIL_G_VELOCITY_STD
    PRESS_MEAN, PRESS_STD = AIRFOIL_G_PRESSURE_MEAN, AIRFOIL_G_PRESSURE_STD

    def _filter_nodes(self, pos, node_type, vel, press, faces):
        mask = (
            (pos[:, 0] > -0.5) & (pos[:, 0] < 2.0)
            & (pos[:, 1] > -0.75) & (pos[:, 1] < 0.75)
        )
        wanted = np.nonzero(mask)[0]
        remap = np.zeros(len(mask), np.int64)
        remap[mask] = np.arange(len(wanted), dtype=np.int64)
        face_mask = np.isin(faces, wanted).all(axis=1)
        faces = remap[faces[face_mask]]
        return pos[mask], node_type[mask], vel[:, mask], press[:, mask], faces


class EagleDroneDataset:
    """EAGLE drone npz trajectories (``eagle/Dataloader/eagle.py:15-140``):
    per-step point clouds + triangles, state = [Vx, Vy, Ps, Pg]."""

    def __init__(
        self,
        data_path: str,
        mode: str = "train",
        window_length: int = 990,
        normalize: bool = False,
        with_cluster: bool = False,
        n_cluster: int = 20,
        seed: int = 1,
        split_file: Optional[str] = None,
    ):
        assert mode in ("train", "valid", "test")
        self.fn = data_path
        # EAGLE ships 947/118/118 split lists (``eagle/Splits/*.txt``);
        # honour them when present, else walk the tree
        if split_file is None:
            cand = os.path.join(data_path, "Splits", f"{mode}.txt")
            split_file = cand if os.path.exists(cand) else None
        if split_file:
            with open(split_file) as f:
                rel = [ln.strip() for ln in f if ln.strip()]
            self.dataloc = [os.path.join(data_path, r) for r in rel]
        else:
            self.dataloc = natsorted(
                [os.path.join(r, f)[:-8] for r, _, fs in os.walk(self.fn) for f in fs if f.endswith("sim.npz")]
            )
        if not self.dataloc:
            raise FileNotFoundError(f"No sim.npz under {self.fn}")
        self.mode = mode
        self.window_length = window_length
        self.normalize = normalize
        self.with_cluster = with_cluster
        self.n_cluster = n_cluster
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.dataloc)

    def __getitem__(self, item: int) -> GraphSample:
        path = self.dataloc[item]
        T = self.window_length
        t = 0 if T == 990 else int(self._rng.integers(0, 990 - T + 1))
        if self.mode != "train" and T != 990:
            t = 100
        data = np.load(os.path.join(path, "sim.npz"), mmap_mode="r")
        mesh_pos = np.asarray(data["pointcloud"][t:t + T], np.float32)
        cells = np.load(os.path.join(path, "triangles.npy"))[t:t + T]
        vel = np.stack([data["VX"][t:t + T], data["VY"][t:t + T]], axis=-1).astype(np.float32)
        press = np.stack([data["PS"][t:t + T], data["PG"][t:t + T]], axis=-1).astype(np.float32)
        node_type = np.asarray(data["mask"][t:t + T]).astype(np.int64)

        if self.normalize:
            vel = (vel - EAGLE_VELOCITY_MEAN) / EAGLE_VELOCITY_STD
            press = (press - EAGLE_PRESSURE_MEAN) / EAGLE_PRESSURE_STD

        state = np.concatenate([vel, press], axis=-1)
        nt = one_hot9(node_type)
        if nt.ndim == 4 and nt.shape[-2] == 1:  # (T, N, 1) codes (``eagle.py:71``)
            nt = nt.squeeze(-2)
        # EAGLE meshes change per step; use the first step's topology for the
        # static edge list (matching the per-window treatment upstream)
        edges = faces_to_edges(np.asarray(cells[0], np.int64))
        cluster = None
        if self.with_cluster:
            cpath = os.path.join(path, f"constrained_kmeans_{self.n_cluster}.npy")
            cluster = np.load(cpath, mmap_mode="r")[t:t + T].copy().astype(np.int64)
        return GraphSample(mesh_pos=mesh_pos, edges=edges, state=state, node_type=nt,
                           cluster=cluster, faces=np.asarray(cells[0]))


# -- static-shape collate ----------------------------------------------------


def bucket_sizes(samples: list[GraphSample]) -> tuple[int, int, int]:
    n = max(s.mesh_pos.shape[1] for s in samples)
    e = max(s.edges.shape[0] for s in samples)
    c = max((s.cluster.shape[1] if s.cluster is not None else 1) for s in samples)
    return n, e, c


def static_bucket_sizes(dataset) -> tuple[int, int, int, int]:
    """Dataset-wide max (nodes, edges, clusters, cluster-K), computed by one
    full pass and cached to disk next to the data.

    Guarantees every batch of an epoch collates to identical shapes — ONE
    XLA compile — unlike a probe-and-grow scheme that recompiles whenever a
    later trajectory exceeds the probe (the reference pads per-batch instead:
    ``eagle/train_graphvit.py:34-76``, fine on GPUs, recompile-storm on TPU).
    """
    import json

    fn = getattr(dataset, "fn", None)
    tag = f"{type(dataset).__name__}_{getattr(dataset, 'n_cluster', 0) if getattr(dataset, 'with_cluster', False) else 0}"
    cache = os.path.join(fn, f".fluid_buckets_{tag}.json") if fn and os.path.isdir(fn) else None
    if cache and os.path.exists(cache):
        try:
            with open(cache) as f:
                d = json.load(f)
            if d.get("count") == len(dataset):
                return d["n"], d["e"], d["c"], d["k"]
        except Exception:
            pass

    # topology does not depend on the sampled window; freeze the training
    # RNG stream so the scan doesn't perturb window sampling afterwards
    old_rng = getattr(dataset, "_rng", None)
    if old_rng is not None:
        dataset._rng = np.random.default_rng(0)
    try:
        n = e = c = k = 1
        for i in range(len(dataset)):
            s = dataset[i]
            n = max(n, s.mesh_pos.shape[1])
            e = max(e, s.edges.shape[0])
            if s.cluster is not None:
                c = max(c, s.cluster.shape[1])
                k = max(k, s.cluster.shape[-1])
    finally:
        if old_rng is not None:
            dataset._rng = old_rng
    if cache:
        try:
            with open(cache, "w") as f:
                json.dump({"count": len(dataset), "n": n, "e": e, "c": c, "k": k}, f)
        except OSError:
            pass
    return n, e, c, k


def collate_graphs(
    samples: list[GraphSample],
    n_max: int,
    e_max: int,
    c_max: int = 1,
    ghost_type_value: int = 1,
    k_max: Optional[int] = None,
    squeeze_static: bool = False,
) -> dict[str, np.ndarray]:
    """Ghost-pad to (n_max+1) nodes / (e_max+1) edges / c_max clusters.

    ``squeeze_static=True`` emits time-invariant fields (edges always;
    mesh_pos/node_type/cluster/cluster_mask/mask when every sample repeats
    them across the window — MGN/airfoil/synthetic topologies do) with a
    length-1 time axis.  The train step broadcasts them back ON DEVICE
    (``baselines_cli._expand_time``), so the axon-tunnel H2D transfer
    carries each static tensor once per step instead of T times — the
    reference amortizes host cost with 6 DataLoader workers
    (``eagle/train_graphvit.py:128``); on the TPU the wall cost is the
    tunnel, so sending fewer bytes is the equivalent fix.

    Mirrors ``train_mgn.py:32-59`` / ``train_graphvit.py:34-76``: ghost nodes
    get zero state and ``ghost_type_value`` in every one-hot slot (all-ones
    marks them INPUT+WALL so BC forcing pins them; the GraphViT collate's
    all-twos leaves them to the loss mask), ghost edges self-loop on the
    ghost slot, cluster ids -1 -> ghost slot with mask 0.

    Besides the arrays, the dict carries two STATIC kernel-dispatch flags
    (plain ints, keys prefixed ``_`` — pop them before jit):
    ``_rev_window`` / ``_cluster_window`` — the smallest Pallas window size
    the batch's ``edges[..., 1]`` / cluster-member id streams satisfy
    (0 = no window fits, use XLA).  ``data/reorder.reorder_sample`` is what
    makes them nonzero on real meshes.
    """
    B = len(samples)
    T = samples[0].state.shape[0]
    S = samples[0].state.shape[-1]
    # Ep rounds up to the segment-kernel chunk (256) so the flattened
    # edge axis needs NO device-side row padding in ops/segment_sum_pallas
    # (the pad fusions measured ~10 ms/step at EAGLE scale); the extra
    # slots are ordinary ghost self-loops like the +1 the reference pads.
    Np, Ep = n_max + 1, -(-(e_max + 1) // 256) * 256

    if k_max is None:
        k_max = max((s.cluster.shape[-1] if s.cluster is not None else 1) for s in samples)
    has_cluster = any(s.cluster is not None for s in samples)
    if has_cluster:
        # align the flattened member table (C*K per element) to the kernel
        # chunk so chunks never straddle batch elements (span explosion)
        step = 256 // np.gcd(k_max, 256)
        c_max = -(-c_max // step) * step

    out = {
        "mesh_pos": np.zeros((B, T, Np, 2), np.float32),
        "edges": np.full((B, T, Ep, 2), n_max, np.int32),
        "state": np.zeros((B, T, Np, S), np.float32),
        "node_type": np.full((B, T, Np, 9), ghost_type_value, np.int32),
        "mask": np.zeros((B, T, Np), np.float32),
        "cluster": np.full((B, T, c_max, k_max), n_max, np.int64),
        "cluster_mask": np.zeros((B, T, c_max, k_max), np.float32),
    }

    for b, s in enumerate(samples):
        N = s.mesh_pos.shape[1]
        E = s.edges.shape[0]
        out["mesh_pos"][b, :, :N] = s.mesh_pos
        out["state"][b, :, :N] = s.state
        out["node_type"][b, :, :N] = s.node_type
        out["edges"][b, :, :E] = s.edges[None]
        out["mask"][b, :, :N] = 1.0
        # the chunk mixing real and ghost edges gets its ghosts' RECEIVER
        # column moved next to the chunk's real receivers, keeping the
        # column-1 span window-local.  Ghost edges still send to the ghost
        # slot (column 0 = n_max), so nothing they carry reaches a real
        # node — real outputs are bit-identical under either ghost id.
        if 0 < E < Ep and E % 256 != 0:
            lo = (E // 256) * 256
            out["edges"][b, :, E:lo + 256, 1] = int(s.edges[lo:E, 1].min())
        if s.cluster is not None:
            C, K = s.cluster.shape[1:]
            cl = s.cluster.copy()
            cm = (cl != -1).astype(np.float32)
            cl[cl == -1] = n_max
            out["cluster"][b, :, :C, :K] = cl
            out["cluster_mask"][b, :, :C, :K] = cm
    _check_sorted_contract(out)
    out["_rev_window"], out["_cluster_window"] = _window_flags(out, has_cluster)
    if squeeze_static:
        # tunnel-friendly layout: static-topology tensors ride with a
        # length-1 time axis + narrower int types; broadcast/upcast happens
        # on device (baselines_cli._expand_time / model astype)
        out["edges"] = np.ascontiguousarray(out["edges"][:, :1])
        out["node_type"] = out["node_type"].astype(np.int8)
        out["cluster"] = out["cluster"].astype(np.int32)
        for kf in ("mesh_pos", "node_type", "mask", "cluster", "cluster_mask"):
            a = out[kf]
            if a.shape[1] > 1 and (a == a[:, :1]).all():
                out[kf] = np.ascontiguousarray(a[:, :1])
    return out


def _window_flags(batch: dict, has_cluster: bool) -> tuple[int, int]:
    """Smallest Pallas window each unsorted hot-id stream satisfies for
    EVERY time step of this batch (0 = none; the models then keep XLA).
    Mirrors exactly the ids the models hand to ``ops/segment_ops``."""
    from fluid_llm_tpu.ops import segment_sum_pallas as ssp

    n_per = batch["mesh_pos"].shape[-2]
    col1 = batch["edges"][:, 0, :, 1]  # topology is t-invariant per window
    rev = ssp.min_window(col1, n_per)

    cluster = 0
    if has_cluster:
        cl = batch["cluster"]
        cm = batch["cluster_mask"] > 0
        B, T = cl.shape[:2]
        ids = np.where(cm, cl, n_per).reshape(B, T, -1)  # ghosts out of range
        ws = {ssp.min_window(ids[:, t], n_per) for t in range(T)}
        cluster = 0 if 0 in ws else max(ws)
    return rev, cluster


def iterate_graph_batches(
    dataset, batch_size: int, *, shuffle: bool, seed: int = 0,
    ghost_type_value: int = 1, reorder="cluster",
    squeeze_static: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    """Batch iterator with TRUE dataset-wide bucket sizes: every batch of
    every epoch has identical shapes, so the train step compiles exactly
    once (sizes come from ``static_bucket_sizes``, disk-cached).

    ``reorder`` applies the locality-preserving static node relabeling
    (``data/reorder.reorder_sample``, cached per topology) so the
    collate's ``_rev_window`` / ``_cluster_window`` kernel-dispatch flags
    come out nonzero on real meshes: ``"cluster"`` (or True, the default)
    = cluster-major when clusters exist, ``"rcm"`` = RCM always (the
    better f32 trade for GraphViT), falsy = keep dataset order."""
    n_max, e_max, c_max, k_max = static_bucket_sizes(dataset)
    if reorder:
        from fluid_llm_tpu.data.reorder import reorder_sample
        mode = reorder if isinstance(reorder, str) else "cluster"
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        samples = [dataset[int(j)] for j in order[i:i + batch_size]]
        if reorder:
            samples = [reorder_sample(s, mode) for s in samples]
        # the window-contract guard runs inside collate_graphs
        yield collate_graphs(samples, n_max, e_max, c_max, ghost_type_value,
                             k_max=k_max, squeeze_static=squeeze_static)


def _check_sorted_contract(batch: dict) -> None:
    """Per-batch host check of the static ``windowed=True`` promise the
    models make for ``edges[..., 0]`` (``ops/segment_ops``).  Runs inside
    ``collate_graphs`` so EVERY collate call site is covered — including
    the horizon-eval path that batches samples directly
    (``baselines_cli.py``), not just ``iterate_graph_batches``
    (ADVICE r4).  Gated on the SAME mode + size predicate
    ``segment_ops`` applies (``use_kernel``): when the kernel would route
    to XLA anyway (too few edges, stripe over VMEM budget, kernels off,
    non-TPU backend in auto mode) the guard is silent instead of
    crashing loads that would run correctly."""
    import jax

    from fluid_llm_tpu.ops import segment_sum_pallas as ssp

    if ssp.mode() == "xla" or (
        ssp.mode() == "auto" and jax.default_backend() != "tpu"
    ):
        return
    col0 = batch["edges"][..., 0]
    n_per = batch["mesh_pos"].shape[-2]
    # models call the segment ops per time step with (B, E) ids, so the
    # engage predicate is evaluated at THAT flattened size (Ep is a CHUNK
    # multiple, so chunk spans are identical under either flattening)
    b = col0.shape[0]
    use, _ = ssp.use_kernel(b * n_per, b * col0.shape[-1])
    if not use:
        return
    if not ssp.host_kernel_ok(col0, n_per):
        raise ValueError(
            "edges[..., 0] violates the sorted/window contract the "
            "segment-sum kernels rely on (custom dataset with "
            "unsorted edge lists or extreme degree skew?).  Sort "
            "edges by column 0 per graph (see faces_to_edges) or set "
            "FLUID_SEGSUM=xla to disable the kernels."
        )
