"""Train / eval CLI for the EAGLE-benchmark baselines.

Equivalent of ``eagle/train_{mgn,gat,graphvit,DilResNet}.py`` and
``eagle/eval_{mgn,graphvit,DRN}.py`` as one entrypoint:

    python -m fluid_llm_tpu.baselines_cli --model mgn --dataset_path ... \
        --epoch 500 [--eval] [...]

Protocol parity: Adam + ExponentialLR(0.991) stepped after epoch 1
(``train_mgn.py:124-127,139-140``), masked MSE losses per model, fixed
val/test windows, rollout eval scored by mesh->grid N-RMSE
(``eagle_utils.py:89-130``) with cumulative per-step RMSE CSVs
(``eval_graphvit.py:119-147``).  Checkpoints are Orbax trees under
``trained_models/<model>/<name>`` (the reference saves bare ``.nn``
state dicts, ``train_mgn.py:150-151``).
"""

from __future__ import annotations

import argparse
import csv
import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluid_llm_tpu.data.eagle_mesh import (
    EagleDroneDataset,
    EagleMGNDataset,
    collate_graphs,
    iterate_graph_batches,
)
from fluid_llm_tpu.data.grid_images import GridImageDataset, iterate_image_batches
from fluid_llm_tpu.models.baselines.dilresnet import (
    dilresnet_apply,
    dilresnet_init,
    dilresnet_loss,
)
from fluid_llm_tpu.models.baselines.gat import gat_apply, gat_init
from fluid_llm_tpu.models.baselines.graphvit import (
    graphvit_apply,
    graphvit_init,
    graphvit_loss,
)
from fluid_llm_tpu.models.baselines.mgn import mgn_apply, mgn_init, mgn_loss
from fluid_llm_tpu.train.eagle_eval import get_nrmse
from fluid_llm_tpu.train.metrics import calc_n_rmse
from fluid_llm_tpu.utils import set_seed

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.baselines")


def _to_device(batch):
    # "_"-prefixed keys are host-side static kernel-dispatch flags
    return {k: v if k.startswith("_") else jnp.asarray(v)
            for k, v in batch.items()}


def _pop_flags(batch) -> tuple[int, int]:
    """(rev_window, cluster_window) static Pallas dispatch flags the
    collate attached (``data/eagle_mesh.collate_graphs``)."""
    return (batch.pop("_rev_window", 0), batch.pop("_cluster_window", 0))


def _bind_flags(apply_fn, stateful: bool, flags: tuple[int, int]):
    if stateful:  # mgn/gat have no cluster ops
        return functools.partial(apply_fn, rev_window=flags[0])
    return functools.partial(apply_fn, rev_window=flags[0],
                             cluster_window=flags[1])


def _expand_time(batch):
    """Broadcast ``squeeze_static``-collated length-1 time axes back to the
    window length ON DEVICE (a cheap HBM copy instead of T axon-tunnel
    transfers — ``data/eagle_mesh.collate_graphs``)."""
    T = batch["state"].shape[1]
    out = dict(batch)
    for k, v in batch.items():
        if k.startswith("_") or k == "state":
            continue
        if v.ndim >= 2 and v.shape[1] == 1 and T > 1:
            out[k] = jnp.broadcast_to(v, v.shape[:1] + (T,) + v.shape[2:])
    return out


def _prefetch_device(batch_iter, depth: int = 2):
    """Stage host batch assembly + device transfer ``depth`` batches ahead
    of compute on a worker thread (the EAGLE-scale profile shows the wall
    step is host/transfer-bound ~5x over device time; the analog of the
    reference's ``DataLoader(num_workers, prefetch_factor)``,
    ``train_mgn.py:96``).  ``depth=0`` disables (synchronous)."""
    if depth <= 0:
        for batch in batch_iter:
            yield _to_device(batch)
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in batch_iter:
                q.put(_to_device(item))
            q.put(done)
        except BaseException as e:  # surface on the consumer side
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def build_dataset(args, mode, window):
    if args.model == "dilresnet":
        from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset

        if args.dataset_path == "synthetic":
            kw = {"max_steps": args.max_steps} if args.max_steps else {}
            src = SyntheticCylinderDataset(
                n_trajectories=args.n_traj, resolution=args.resolution,
                mode=mode, **kw,
            )
        else:
            from fluid_llm_tpu.data.cylinder import MGNDataset

            src = MGNDataset(f"{args.dataset_path}/{mode}", resolution=args.resolution, mode=mode)
        return GridImageDataset(src, window_length=window, mode=mode)
    if args.dataset_path == "synthetic":
        from fluid_llm_tpu.data.synthetic import SyntheticGraphDataset

        kw = {}
        if args.mesh_nodes:
            nx, ny = (int(v) for v in args.mesh_nodes.lower().split("x"))
            kw["mesh_nodes"] = (nx, ny)
        if args.max_steps:
            kw["max_steps"] = args.max_steps
        return SyntheticGraphDataset(
            n_trajectories=args.n_traj, mode=mode, window_length=window,
            n_cluster=args.n_cluster if args.model == "graphvit" else 0,
            **kw,
        )
    if "eagle" in args.dataset_path.lower():
        return EagleDroneDataset(
            args.dataset_path, mode=mode, window_length=window,
            normalize=(args.model == "graphvit"),
            with_cluster=(args.model == "graphvit"), n_cluster=args.n_cluster,
        )
    if "airfoil" in args.dataset_path.lower():
        # airfoil-protocol graphs: far-field crop + own normalization
        # constants (``eagle/Dataloader/airfoil.py``)
        from fluid_llm_tpu.data.eagle_mesh import AirfoilGraphDataset

        return AirfoilGraphDataset(
            args.dataset_path, mode=mode, window_length=window,
            normalize=(args.model == "graphvit"),
            with_cluster=(args.model == "graphvit"), n_cluster=args.n_cluster,
        )
    return EagleMGNDataset(
        args.dataset_path, mode=mode, window_length=window,
        normalize=(args.model == "graphvit"),
        with_cluster=(args.model == "graphvit"), n_cluster=args.n_cluster,
    )


# -- per-model step functions -----------------------------------------------


def _order_mode(args) -> str:
    """Node-relabel mode for the window kernels: cluster-major is a
    measured win only under bf16 compute (wider edge window + 2-stripe
    gathers eat the f32 3-limb budget — BENCHMARKS "r5: window-local
    kernels"); f32 keeps RCM (cluster ops take the XLA path)."""
    return "cluster" if args.dtype == "bf16" else "rcm"


def _cast_fn(dtype: str):
    """Param cast for the compute dtype: bf16 compute / f32 masters (the
    f32 optimizer state and normalizers are untouched; gradients flow back
    to the f32 params through the cast).  TPU-native addition — the
    reference trains the baselines in f32 only."""
    if dtype != "bf16":
        return lambda t: t
    return lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def make_graph_step(args, apply_fn, loss_fn, stateful_norm: bool):
    cast = _cast_fn(args.dtype)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def train_step(params, norm, opt_state, batch, rng, lr):
        batch = _expand_time(batch)

        def loss(p):
            p = cast(p)
            if stateful_norm:
                sh, oh, tgt, new_norm = apply_fn(
                    p, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
                    batch["state"], batch["node_type"], train=True,
                    apply_noise=args.noise_std > 0, noise_std=args.noise_std, rng=rng,
                )
            else:
                sh, oh, tgt = apply_fn(
                    p, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
                    batch["state"], batch["node_type"], batch["cluster"],
                    batch["cluster_mask"],
                    apply_noise=args.noise_std > 0, noise_std=args.noise_std, rng=rng,
                )
                new_norm = norm
            return loss_fn(oh, tgt, batch["mask"]), new_norm

        (l, new_norm), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = opt_update(grads, opt_state, lr, params)
        params = optax.apply_updates(params, updates)
        return params, new_norm, opt_state, l

    return train_step


def opt_update(grads, opt_state, lr, params):
    # Adam with an injectable lr (ExponentialLR handled host-side)
    del params
    opt = optax.scale_by_adam()
    updates, inner = opt.update(grads, opt_state)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return updates, inner


def run_graph_model(args):
    rng = set_seed(1)
    window_train, window_val = args.horizon_train, args.horizon_val
    train_ds = build_dataset(args, "train", window_train)
    valid_ds = build_dataset(args, "valid", window_val)

    if args.model == "mgn":
        params, norm = mgn_init(jax.random.PRNGKey(1), 4, args.n_processor)
        apply_fn, loss_fn, stateful = mgn_apply, functools.partial(mgn_loss, w_pressure=args.w_pressure), True
        ghost = 1
    elif args.model == "gat":
        params, norm = gat_init(jax.random.PRNGKey(1), 4, args.n_processor, args.n_heads)
        apply_fn, loss_fn, stateful = gat_apply, functools.partial(mgn_loss, w_pressure=args.w_pressure), True
        ghost = 1
    else:  # graphvit
        params = graphvit_init(jax.random.PRNGKey(1), 4, args.w_size)
        norm = {}
        apply_fn, loss_fn, stateful = graphvit_apply, functools.partial(graphvit_loss, alpha=args.alpha), False
        ghost = 2

    steps: dict[tuple[int, int], object] = {}  # jitted step per static flags
    opt_state = optax.scale_by_adam().init(params)

    save_dir = os.path.join(args.save_dir, args.model)
    os.makedirs(save_dir, exist_ok=True)
    lr = args.lr
    import time as _time

    prof_on = False
    for epoch in range(args.epoch):
        t_ep, n_steps = _time.monotonic(), 0
        for dev_batch in _prefetch_device(
            iterate_graph_batches(train_ds, args.batch_size, shuffle=True,
                                  seed=epoch, ghost_type_value=ghost,
                                  reorder=_order_mode(args),
                                  squeeze_static=True),
            depth=args.prefetch,
        ):
            if args.profile_dir and epoch == 0 and n_steps == 2:
                float(loss)  # drain compile + warmup before the capture
                jax.profiler.start_trace(args.profile_dir)
                prof_on = True
            flags = _pop_flags(dev_batch)
            if flags not in steps:
                steps[flags] = make_graph_step(
                    args, _bind_flags(apply_fn, stateful, flags), loss_fn, stateful)
            rng, sk = jax.random.split(rng)
            params, norm, opt_state, loss = steps[flags](
                params, norm, opt_state, dev_batch, sk, jnp.float32(lr)
            )
            n_steps += 1
            if prof_on and n_steps == 6:
                float(loss)
                jax.profiler.stop_trace()
                prof_on = False
                from fluid_llm_tpu.tools.profiling import summarize_xplane
                summarize_xplane(args.profile_dir, divisor=4)
        float(loss)  # sync before timing (axon: block_until_ready unreliable)
        if prof_on:  # epoch shorter than the capture window
            jax.profiler.stop_trace()
            prof_on = False
            from fluid_llm_tpu.tools.profiling import summarize_xplane
            summarize_xplane(args.profile_dir, divisor=max(n_steps - 2, 1))
        dt = _time.monotonic() - t_ep
        if epoch > 1:
            lr *= 0.991  # ExponentialLR(0.991) (``train_mgn.py:126,139-140``)
        val_loss = validate_graph(args, params, norm, valid_ds, apply_fn, loss_fn, stateful, ghost)
        logger.info(
            "=== EPOCH %d === loss=%.4g lr=%.3g (%d steps, %.2fs, %.1f steps/s)",
            epoch + 1, val_loss, lr, n_steps, dt, n_steps / max(dt, 1e-9),
        )
        save_params(save_dir, args.name, params, norm)
    if args.epoch == 0:
        params, norm = load_params(save_dir, args.name, params, norm)
    eval_graph(args, params, norm, apply_fn, stateful, ghost)


def validate_graph(args, params, norm, ds, apply_fn, loss_fn, stateful, ghost):
    tot, cpt = 0.0, 0
    params = _cast_fn(args.dtype)(params)
    for b in _prefetch_device(
        iterate_graph_batches(ds, args.batch_size, shuffle=False,
                              ghost_type_value=ghost,
                              reorder=_order_mode(args), squeeze_static=True),
        depth=args.prefetch,
    ):
        fn = _bind_flags(apply_fn, stateful, _pop_flags(b))
        b = _expand_time(b)
        if stateful:
            sh, oh, tgt, _ = fn(
                params, norm, b["mesh_pos"], b["edges"].astype(jnp.int32),
                b["state"], b["node_type"], train=False,
            )
        else:
            sh, oh, tgt = fn(
                params, b["mesh_pos"], b["edges"].astype(jnp.int32),
                b["state"], b["node_type"], b["cluster"], b["cluster_mask"],
            )
        tot += float(loss_fn(oh, tgt, b["mask"]))
        cpt += b["mesh_pos"].shape[0]
    return tot / max(cpt, 1)


def eval_graph(args, params, norm, apply_fn, stateful, ghost):
    """Long-window rollout + mesh->grid N-RMSE + per-step RMSE CSV
    (``eval_mgn.py:29-68``, ``eval_graphvit.py:77-149``)."""
    from fluid_llm_tpu.data.reorder import reorder_sample

    ds = build_dataset(args, "test", args.horizon_eval)
    rows = []
    for i in range(len(ds)):
        sample = reorder_sample(ds[i], _order_mode(args))
        batch = _to_device(
            collate_graphs(
                [sample], sample.mesh_pos.shape[1], sample.edges.shape[0],
                (sample.cluster.shape[1] if sample.cluster is not None else 1), ghost,
                squeeze_static=True,
            )
        )
        fn = _bind_flags(apply_fn, stateful, _pop_flags(batch))
        batch = _expand_time(batch)
        eval_params = _cast_fn(args.dtype)(params)
        if stateful:
            sh, _, _, _ = fn(
                eval_params, norm, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
                batch["state"], batch["node_type"], train=False,
            )
        else:
            sh, _, _ = fn(
                eval_params, batch["mesh_pos"], batch["edges"].astype(jnp.int32),
                batch["state"], batch["node_type"], batch["cluster"], batch["cluster_mask"],
            )
        n_real = sample.mesh_pos.shape[1]
        nrmse = get_nrmse(
            np.asarray(batch["state"])[:, :, :n_real],
            np.asarray(sh)[:, :, :n_real],
            sample.mesh_pos[0], sample.faces, resolution=args.resolution,
        )
        rows.append(nrmse[0])
        logger.info("traj %d N-RMSE mean %.4g", i, float(nrmse.mean()))
    per_step = np.stack(rows).mean(axis=0)
    logger.info("Overall N-RMSE: %.4g", float(per_step.mean()))
    csv_path = os.path.join(args.save_dir, args.model, f"{args.name}_nrmse.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "n_rmse"])
        for s, v in enumerate(per_step):
            w.writerow([s, float(v)])
    logger.info("wrote %s", csv_path)


def run_dilresnet(args):
    rng = set_seed(1)
    train_ds = build_dataset(args, "train", args.horizon_train)
    valid_ds = build_dataset(args, "valid", args.horizon_val)
    params = dilresnet_init(jax.random.PRNGKey(1), channels=3)
    opt_state = optax.scale_by_adam().init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, state, mask, rng, lr):
        def loss(p):
            sh, delta, target = dilresnet_apply(
                p, state, mask, apply_noise=args.noise_std > 0,
                noise_std=args.noise_std, rng=rng,
            )
            return dilresnet_loss(delta, target)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt_update(grads, opt_state, lr, params)
        return optax.apply_updates(params, updates), opt_state, l

    save_dir = os.path.join(args.save_dir, "dilresnet")
    os.makedirs(save_dir, exist_ok=True)
    lr = args.lr
    for epoch in range(args.epoch):
        for state, mask in iterate_image_batches(train_ds, args.batch_size, shuffle=True, seed=epoch):
            rng, sk = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(state), jnp.asarray(mask), sk, jnp.float32(lr)
            )
        if epoch > 1:
            lr *= 0.991
        logger.info("=== EPOCH %d === loss=%.4g", epoch + 1, float(loss))
        save_params(save_dir, args.name, params, {})
    if args.epoch == 0:
        params, _ = load_params(save_dir, args.name, params, {})

    # eval: grid rollout + calc_n_rmse (``eval_DRN.py:43-88``)
    test_ds = build_dataset(args, "test", args.horizon_eval)
    rows = []
    for state, mask in iterate_image_batches(test_ds, 1, shuffle=False):
        sh, delta, target = dilresnet_apply(params, jnp.asarray(state), jnp.asarray(mask))
        pred = jnp.moveaxis(sh, -1, 2)  # (B, T, C, H, W)
        true = jnp.moveaxis(jnp.asarray(state), -1, 2)
        m = jnp.broadcast_to(jnp.asarray(mask)[:, :, None], true.shape)
        rows.append(np.asarray(calc_n_rmse(pred, true, m))[0])
    per_step = np.stack(rows).mean(axis=0)
    probes = {s: float(per_step[s]) for s in (5, 20, 40, 100) if s < len(per_step)}
    logger.info(
        "DilResNet overall N-RMSE: %.4g (per-step probes %s)",
        float(per_step.mean()),
        {k: f"{v:.3g}" for k, v in probes.items()},
    )
    csv_path = os.path.join(save_dir, f"{args.name}_nrmse.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "n_rmse"])
        for s, v in enumerate(per_step):
            w.writerow([s, float(v)])
    logger.info("wrote %s", csv_path)


def save_params(save_dir, name, params, norm):
    import pickle

    with open(os.path.join(save_dir, f"{name}.pkl"), "wb") as f:
        pickle.dump(jax.device_get({"params": params, "norm": norm}), f)


def load_params(save_dir, name, params_like, norm_like):
    import pickle

    with open(os.path.join(save_dir, f"{name}.pkl"), "rb") as f:
        payload = pickle.load(f)
    return payload["params"], payload["norm"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["mgn", "gat", "graphvit", "dilresnet"], required=True)
    parser.add_argument("--epoch", type=int, default=500)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--dataset_path", default="synthetic")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--w_pressure", type=float, default=0.1)
    parser.add_argument("--alpha", type=float, default=0.1)
    parser.add_argument("--horizon_val", type=int, default=5)
    parser.add_argument("--horizon_train", type=int, default=5)
    # reference eval horizons: MGN/DRN 101-step windows (``eval_mgn.py:29``,
    # ``eval_DRN.py:43``), GraphViT 51 (``eval_graphvit.py:77``)
    parser.add_argument("--horizon_eval", type=int, default=None)
    parser.add_argument("--n_processor", type=int, default=15)
    parser.add_argument("--n_heads", type=int, default=4)
    parser.add_argument("--n_cluster", type=int, default=10)
    parser.add_argument("--w_size", type=int, default=512)
    parser.add_argument("--noise_std", type=float, default=2e-2)
    parser.add_argument("--resolution", type=int, default=238)
    parser.add_argument("--n_traj", type=int, default=4, help="synthetic trajectories")
    parser.add_argument("--mesh_nodes", default=None,
                        help="synthetic mesh grid 'NXxNY' (default 24x10 for "
                             "graphs; EAGLE geometry is ~3.5k nodes -> 84x42)")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="synthetic trajectory length in frames (default "
                             "200; the reference's real DeepMind trajectories "
                             "run ~600 — used by the DRN length ablation)")
    parser.add_argument("--name", default="run")
    parser.add_argument("--profile_dir", default=None,
                        help="jax.profiler trace of train steps 2-5 of epoch 0 "
                             "+ per-op device-time rollup (graph models)")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                        help="compute dtype: bf16 runs the network in "
                             "bfloat16 against f32 master weights "
                             "(normalizers/loss/rollout state stay f32); "
                             "TPU-native speed mode, accuracy measured in "
                             "BENCHMARKS.md")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="batches staged ahead (host build + device put "
                             "on a worker thread); 0 = synchronous")
    parser.add_argument("--save_dir", default="trained_models")
    args = parser.parse_args(argv)
    if args.horizon_eval is None:
        args.horizon_eval = 51 if args.model == "graphvit" else 101

    if args.model == "dilresnet":
        run_dilresnet(args)
    else:
        run_graph_model(args)


if __name__ == "__main__":
    main()
