"""Inference entrypoint: load a checkpoint, run the 251-step rollout protocol.

Equivalent of ``src/inference.py:27-191``: load the run's saved config +
checkpoint by folder index, build the test dataset at ``seq_len=253``,
autoregressively generate ``pred_steps=251`` from 1 context state (bs=1),
report per-step and mean N-RMSE, and optionally save comparison plots.

Debug ``exit()`` calls in the reference (``inference.py:78,123-125``) are
knowingly omitted.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import numpy as np

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data import get_dataset, make_batches
from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.ops.patching import patch_to_img
from fluid_llm_tpu.rollout.generate import gen_seq
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.metrics import calc_n_rmse
from fluid_llm_tpu.utils import set_seed

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.inference")


def test_generate(
    model: FluidLLM,
    params,
    dataset,
    batch_size: int = 1,
    pred_steps: int = 251,
    ctx_states: int = 1,
    plot_dir: str | None = None,
    streaming: bool = False,
):
    """``src/inference.py:82-147``; returns (per-step N-RMSE, mean).

    ``streaming=True`` serves through the KV-cache path
    (``rollout/streaming.py``) — rope-backbone models only.
    """
    end_state = pred_steps + ctx_states - 1

    if streaming:
        from fluid_llm_tpu.rollout.streaming import gen_seq_streaming

        roll = jax.jit(
            lambda p, batch: gen_seq_streaming(model, p, batch, pred_steps, start_state=ctx_states)
        )
    else:
        roll = jax.jit(
            lambda p, batch: gen_seq(model, p, batch, pred_steps, start_state=ctx_states)
        )

    n_rmses = []
    first_batch = None
    for i, batch in enumerate(make_batches(dataset, batch_size, shuffle=False)):
        states, _, diffs, bc_mask, position_ids = batch
        pred_states, pred_diffs = roll(params, batch)
        pred_states = pred_states[:, :-1]  # last state has no diff

        true_states = patch_to_img(states, model.ds_props)[:, :end_state]
        mask_img = patch_to_img(bc_mask.astype(np.float32), model.ds_props).astype(bool)
        mask_img = mask_img[:, :end_state]

        n_rmse = calc_n_rmse(pred_states, true_states, mask_img)
        n_rmses.append(np.asarray(n_rmse))
        if first_batch is None:
            first_batch = (np.asarray(true_states), np.asarray(pred_states))
        logger.info("trajectory batch %d done", i)

    n_rmses = np.concatenate(n_rmses, axis=0)
    per_step = n_rmses.mean(axis=0)[ctx_states - 1:]
    mean = float(per_step.mean())
    logger.info("Standard N_RMSE: %s, Mean: %.4g", np.array2string(per_step, precision=4), mean)

    if plot_dir and first_batch is not None:
        save_rollout_plots(first_batch[1][0], first_batch[0][0], plot_dir)
    return per_step, mean


def save_rollout_plots(pred_states, true_states, plot_dir: str):
    """Comparison frames at rollout steps {0,20,40,60,80,100}
    (``inference.py:65-77``, ``plots/`` naming convention)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(plot_dir, exist_ok=True)
    vmin, vmax = true_states[:100, 0].min(), true_states[:100, 0].max()
    for j in [0, 20, 40, 60, 80, 100]:
        if j >= len(pred_states):
            break
        fig = plt.figure(figsize=(15, 4), dpi=100)
        plt.imshow(np.flipud(pred_states[j, 0].T), vmin=vmin, vmax=vmax)
        plt.axis("off")
        plt.tight_layout()
        fig.savefig(os.path.join(plot_dir, f"rollout_{j}.png"), bbox_inches="tight", pad_inches=0)
        plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", default="model_checkpoints")
    parser.add_argument("--load_no", type=int, default=-1, help="run folder index")
    parser.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    parser.add_argument("--seq_len", type=int, default=253)
    parser.add_argument("--pred_steps", type=int, default=251)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--plot_dir", default=None)
    parser.add_argument("--csv", default=None, help="write per-step N-RMSE CSV")
    parser.add_argument(
        "--streaming", action="store_true",
        help="serve via the KV-cache streaming rollout (rope backbones only)",
    )
    args = parser.parse_args(argv)

    # serving default: trade ~1 % rollout throughput for 3.6-16x faster cold
    # compile of the 251-step programs (FLUID_COMPILE_EFFORT=default opts out;
    # measured frontier in BENCHMARKS.md "Cold compile")
    effort = os.environ.get("FLUID_COMPILE_EFFORT", "-0.3")
    if effort not in ("", "default"):
        try:
            jax.config.update("jax_exec_time_optimization_effort", float(effort))
        except Exception as e:
            logger.warning("compile-effort knob unavailable: %s", e)

    set_seed()
    load_path = ckpt.get_save_folder(args.checkpoint_dir, args.load_no)
    cfg = ckpt.load_config(load_path)
    step = args.step if args.step is not None else ckpt.latest_step(load_path)
    logger.info("Loading checkpoint from: %s step_%s", load_path, step)

    # model geometry comes from the train-time dataset config (``inference.py:173-174``)
    probe_ds = get_dataset(cfg.replace(seq_len=cfg.autoreg_seq_len), mode="valid")
    # restore through the mesh-aware template so multi-device inference
    # (e.g. LLaMA-7B tensor-parallel) loads sharded, not single-device
    from fluid_llm_tpu.main import init_state_and_mesh

    model, trainer, like, mesh = init_state_and_mesh(
        cfg, probe_ds.ds_props(), jax.random.PRNGKey(0)
    )
    state = ckpt.restore_checkpoint(load_path, step, like)
    if mesh is not None:
        logger.info("Restored onto mesh %s", dict(mesh.shape))

    test_ds = get_dataset(cfg.replace(seq_len=args.seq_len), mode="test")
    params = state.params
    if mesh is None:
        # single-device serving: fold adapters + fuse q/k/v (exact transform;
        # sharded params keep the per-name partition specs instead)
        params = model.prepare_inference_params(params)
    per_step, mean = test_generate(
        model, params, test_ds,
        batch_size=args.batch_size, pred_steps=args.pred_steps, plot_dir=args.plot_dir,
        streaming=args.streaming,
    )
    if args.csv:
        import csv as _csv

        if os.path.dirname(args.csv):
            os.makedirs(os.path.dirname(args.csv), exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["step", "n_rmse"])
            for s, v in enumerate(per_step):
                w.writerow([s, float(v)])
        logger.info("wrote %s", args.csv)


if __name__ == "__main__":
    main(sys.argv[1:])
