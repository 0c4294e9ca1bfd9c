"""Device mesh construction and batch/param sharding.

The reference's only parallelism is DDP gradient all-reduce via HF
Accelerate/NCCL (``run_training.sh:5``, ``src/main.py:151``, SURVEY.md §2.4).
TPU-native equivalent: a ``jax.sharding.Mesh`` with axes

    ("data", "fsdp", "model")

- ``data``:  pure batch sharding (DDP analogue; gradient psum inserted by XLA),
- ``fsdp``:  optimizer/parameter sharding (the ZeRO-2 analogue the reference
             wires but never enables, ``src/utils.py:53-58``),
- ``model``: tensor parallelism for large backbones (LLaMA-7B on v5e-8 —
             attention heads and MLP hidden sharded).

All collectives are emitted by XLA from sharding annotations; there is no
hand-written communication.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluid_llm_tpu.config import ParallelConfig


def mesh_shape(n_devices: int, cfg: Optional[ParallelConfig] = None) -> tuple[int, int, int]:
    """Resolve the (data, fsdp, model) axis sizes for ``n_devices``
    (after the optional ``pipe``/``expert`` axes have been divided out)."""
    cfg = cfg or ParallelConfig()
    model = max(1, cfg.model_axis)
    fsdp = max(1, cfg.fsdp_axis)
    pipe = max(1, getattr(cfg, "pipe_axis", 1))
    expert = max(1, getattr(cfg, "expert_axis", 1))
    if pipe > 1 and expert > 1:
        raise ValueError("pipe and expert axes cannot be combined (MoE uses "
                         "the per-layer layout; pipeline uses stacked layers)")
    if n_devices % (pipe * expert) != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by pipe={pipe} * expert={expert}"
        )
    n_devices //= pipe * expert
    if n_devices % (model * fsdp) != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by model={model} * fsdp={fsdp}"
        )
    data = n_devices // (model * fsdp) if cfg.data_axis == -1 else cfg.data_axis
    if data * fsdp * model != n_devices:
        raise ValueError(f"mesh {data}x{fsdp}x{model} != {n_devices} devices")
    return data, fsdp, model


def multihost_device_order(devices, data: int, fsdp: int, model: int) -> np.ndarray:
    """Arrange global devices as a (data, fsdp, model) array such that
    ``fsdp`` and ``model`` stay WITHIN a process (collectives ride ICI) and
    only ``data`` spans processes (gradient psum is the sole DCN
    collective — the reference's DDP topology, ``src/main.py:150-152``).

    Requires fsdp*model to divide each process's device count; processes
    must hold equally many devices.  Pure math over ``process_index`` /
    ``id`` attributes, unit-testable with fake device objects.
    """
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(f"uneven devices per process: { {k: len(v) for k, v in by_proc.items()} }")
    per = counts.pop()
    n_proc = len(by_proc)
    if (fsdp * model) > per or per % (fsdp * model) != 0:
        raise ValueError(
            f"fsdp*model={fsdp * model} must divide the {per} devices of each "
            f"process (model/fsdp collectives must not cross DCN)"
        )
    local_data = per // (fsdp * model)
    if data != n_proc * local_data:
        raise ValueError(
            f"data axis {data} != n_processes {n_proc} * local data {local_data}"
        )
    arr = np.empty((data, fsdp, model), dtype=object)
    for pi, pidx in enumerate(sorted(by_proc)):
        local = sorted(by_proc[pidx], key=lambda d: getattr(d, "id", 0))
        block = np.asarray(local, dtype=object).reshape(local_data, fsdp, model)
        arr[pi * local_data:(pi + 1) * local_data] = block
    return arr


def make_mesh(cfg: Optional[ParallelConfig] = None, devices=None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = devices if devices is not None else jax.devices()
    pipe = max(1, getattr(cfg, "pipe_axis", 1))
    expert = max(1, getattr(cfg, "expert_axis", 1))
    data, fsdp, model = mesh_shape(len(devices), cfg)
    multihost = any(getattr(d, "process_index", 0) != 0 for d in devices)
    if multihost:
        if pipe > 1:
            raise NotImplementedError(
                "pipe stages must stay within a host (ppermute rides ICI); "
                "use pipe_axis=1 across hosts"
            )
        if expert > 1:
            raise NotImplementedError(
                "expert dispatch all-to-alls must ride ICI; "
                "use expert_axis=1 across hosts"
            )
        arr = multihost_device_order(devices, data, fsdp, model)
        return Mesh(arr, ("data", "fsdp", "model"))
    if pipe > 1:
        # pipe LAST: consecutive device ids become consecutive stages, so
        # the per-tick ppermute hop is a nearest-neighbour ICI transfer
        arr = np.asarray(devices).reshape(data, fsdp, model, pipe)
        return Mesh(arr, ("data", "fsdp", "model", "pipe"))
    if expert > 1:
        # experts LAST: the dispatch all-to-all permutes between adjacent
        # device ids; batch additionally shards over "expert" (see
        # batch_sharding) so EP devices are not idle outside MoE layers
        arr = np.asarray(devices).reshape(data, fsdp, model, expert)
        return Mesh(arr, ("data", "fsdp", "model", "expert"))
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, ("data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard over (data, fsdp) jointly — fsdp devices see
    distinct microbatches, ZeRO-style.  With an ``expert`` axis the batch
    shards over it too (canonical DP+EP: tokens live data-parallel on the
    expert devices; the MoE dispatch einsum is where GSPMD inserts the
    token→expert all-to-all)."""
    if "expert" in mesh.axis_names:
        return NamedSharding(mesh, P(("data", "fsdp", "expert")))
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: tuple, mesh: Mesh) -> tuple:
    """Place a batch on the mesh.

    Single-process: plain ``device_put``.  Multi-host: every process builds
    the same seeded global batch, keeps its own contiguous data-axis rows
    (the ``multihost_device_order`` layout makes a process's rows
    contiguous), and assembles the global array from process-local shards —
    the ``jax.distributed`` analogue of Accelerate's per-rank DataLoader
    split (``src/main.py:150-152``).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        n_proc = jax.process_count()
        pid = jax.process_index()

        def put(x):
            x = np.asarray(x)
            rows = x.shape[0] // n_proc
            local = x[pid * rows:(pid + 1) * rows]
            return jax.make_array_from_process_local_data(sh, local, x.shape)

        return tuple(put(x) for x in batch)
    return tuple(jax.device_put(x, sh) for x in batch)


# -- parameter partition specs ----------------------------------------------


def backbone_param_specs(backbone_params: dict, fsdp: bool, tp: bool,
                         pp: bool = False, ep: bool = False) -> dict:
    """PartitionSpec tree for the backbone.

    Tensor-parallel layout (classic Megatron split, all-reduce after o/fc2):
      q/k/v: shard output (heads) dim       -> P(fsdp?, "model")
      o:     shard input dim                -> P("model", fsdp?)
      fc1/gate/up: shard output dim         -> P(fsdp?, "model")
      fc2/down:    shard input dim          -> P("model", fsdp?)
    With fsdp, the non-model dim of every matrix is sharded over "fsdp"
    (gathered on use by XLA).

    Works for both the per-layer LIST layout and the ``stack_layers``
    layout (leaves with a leading ``n_layers`` axis); with ``pp`` the
    stacked leading axis is sharded over the ``pipe`` mesh axis —
    pipeline-parallel stages (``parallel/pipeline.py``).
    """
    f = "fsdp" if fsdp else None
    m = "model" if tp else None

    def matrix(kind: str):
        if kind == "col":  # output-dim sharded
            return P(f, m)
        if kind == "row":  # input-dim sharded
            return P(m, f)
        return P(f)

    def linear_spec(kind):
        return {"w": matrix(kind), "b": P(m) if kind == "col" else P()}

    def layer_spec(layer):
        spec = {
            "ln1": {k: P() for k in layer["ln1"]},
            "ln2": {k: P() for k in layer["ln2"]},
            "attn": {
                "q": _fit(linear_spec("col"), layer["attn"]["q"]),
                "k": _fit(linear_spec("col"), layer["attn"]["k"]),
                "v": _fit(linear_spec("col"), layer["attn"]["v"]),
                "o": _fit(linear_spec("row"), layer["attn"]["o"]),
            },
        }
        if "router" in layer["mlp"]:
            # MoE: router replicated (tiny); stacked (E, ...) expert weights
            # shard their leading axis over "expert", trailing dims reuse the
            # dense Megatron col/row splits
            e = "expert" if ep else None

            def expert_spec(kind, p):
                base = _fit(linear_spec(kind), p)
                # int8-quantized expert banks are NOT tiny (they ARE the
                # expert weights): shard the stacked {'q': (E, in, out),
                # 'scale': (E, out)} storage's leading axis over "expert"
                # like the float bank; other nested dicts replicate
                def quant_spec(sub):
                    # _fit returns spec dicts: int8 -> {'q': P(2d), 'scale':
                    # P(out)}; prefix each with the expert axis (the stacked
                    # storage carries a leading E dim).  nf4 'codes' subtrees
                    # stay replicated (3-D banks quantize as int8 only).
                    if isinstance(sub, dict) and "q" in sub and all(
                        isinstance(x, P) for x in sub.values()
                    ):
                        return {k2: P(e, *tuple(v2)) for k2, v2 in sub.items()}
                    return jax.tree_util.tree_map(lambda _: P(), sub)

                return {
                    k: P(e, *tuple(v)) if isinstance(v, P) else quant_spec(v)
                    for k, v in base.items()
                }

            ex = layer["mlp"]["experts"]
            spec["mlp"] = {
                "router": {"w": P()},
                "experts": {
                    name: expert_spec(
                        "row" if name in ("down", "fc2") else "col", ex[name]
                    )
                    for name in ex
                },
            }
        elif "gate" in layer["mlp"]:
            spec["mlp"] = {
                "gate": _fit(linear_spec("col"), layer["mlp"]["gate"]),
                "up": _fit(linear_spec("col"), layer["mlp"]["up"]),
                "down": _fit(linear_spec("row"), layer["mlp"]["down"]),
            }
        else:
            spec["mlp"] = {
                "fc1": _fit(linear_spec("col"), layer["mlp"]["fc1"]),
                "fc2": _fit(linear_spec("row"), layer["mlp"]["fc2"]),
            }
        return spec

    layers = backbone_params["layers"]
    if isinstance(layers, list):
        layers_spec: Any = [layer_spec(l) for l in layers]
    else:  # stacked layout: prepend the layer axis to every leaf spec
        lead = "pipe" if pp else None
        layers_spec = jax.tree_util.tree_map(
            lambda s: P(lead, *tuple(s)),
            layer_spec(layers),
            is_leaf=lambda x: isinstance(x, P),
        )
    spec: dict[str, Any] = {"layers": layers_spec}
    if "final_norm" in backbone_params:  # absent for OPT-350m (post-LN)
        spec["final_norm"] = {k: P() for k in backbone_params["final_norm"]}
    if "project_in" in backbone_params:  # OPT-350m word_embed_proj_dim
        spec["project_in"] = _fit(linear_spec("col"), backbone_params["project_in"])
        spec["project_out"] = _fit(linear_spec("row"), backbone_params["project_out"])
    if "pos_embed" in backbone_params:
        spec["pos_embed"] = P(f)
    return spec


def _fit(spec: dict, params: dict) -> dict:
    """Adapt a linear-layer spec to the actual param leaves: drop missing
    entries (e.g. no bias) and expand specs for quantized weight storage
    (``ops/quant.py``) so quantization composes with the mesh."""
    out: dict[str, Any] = {}
    for k, v in spec.items():
        if k not in params:
            continue
        p = params[k]
        if k == "w" and isinstance(p, dict):
            if "codes" in p:
                # nf4 packed storage: absmax blocks span rows, so the packed
                # bytes don't shard cleanly — replicate (4-bit is tiny)
                out[k] = jax.tree_util.tree_map(lambda _: P(), p)
            else:
                # int8 {q, scale}: q shards like the float weight; the
                # per-output-column scales follow the output dim
                out_axis = v[1] if len(v) > 1 else None
                out[k] = {"q": v, "scale": P(out_axis)}
        else:
            out[k] = v
    return out


def param_specs(params: dict, parallel: ParallelConfig) -> dict:
    """Full-model PartitionSpec tree mirroring ``FluidLLM`` params."""
    fsdp = parallel.fsdp_axis > 1
    tp = parallel.model_axis > 1
    pp = getattr(parallel, "pipe_axis", 1) > 1
    ep = getattr(parallel, "expert_axis", 1) > 1

    spec: dict[str, Any] = {}
    for name, sub in params.items():
        if name == "backbone":
            spec[name] = backbone_param_specs(sub, fsdp, tp, pp=pp, ep=ep)
        elif name == "lora":
            # adapters are tiny; replicate (their matmuls follow the
            # activation sharding)
            spec[name] = jax.tree_util.tree_map(lambda _: P(), sub)
        else:
            spec[name] = jax.tree_util.tree_map(lambda _: P(), sub)
    return spec


def shard_params(params: dict, mesh: Mesh, parallel: ParallelConfig) -> dict:
    # features that rebuild the mesh INSIDE the forward (pipeline shard_map,
    # seq-sharded/ring constraints, MoE expert shardings) call
    # make_mesh(parallel) over ALL devices — a params mesh over a device
    # subset would collide with it inside jit.  Fail here, at placement
    # time, with an actionable message instead.
    rebuilds = (
        getattr(parallel, "pipe_axis", 1) > 1
        or getattr(parallel, "seq_sharded_acts", False)
        or getattr(parallel, "ring_attention", False)
        or getattr(parallel, "expert_axis", 1) > 1
    )
    if rebuilds and mesh.devices.size != len(jax.devices()):
        raise ValueError(
            f"mesh covers {mesh.devices.size} of {len(jax.devices())} "
            "devices, but pipe/seq_sharded_acts/ring/expert features "
            "rebuild the mesh over ALL devices inside the forward — "
            "use every device (or trim jax.devices() via "
            "xla_force_host_platform_device_count)"
        )
    specs = param_specs(params, parallel)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P) or x is None,
    )
