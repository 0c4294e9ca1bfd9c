"""Epoch loop: run-mode selection, validation cadence, checkpoints, logging.

Equivalent of ``src/main.py:43-172``:

- mode selection per epoch: autoreg until ``teacher_forcing.start_epoch``,
  then a ``tf_prob`` coin flip between autoreg and gen/notf (``main.py:43-59``),
- ``StepLR`` stepped once per epoch (``main.py:82``),
- validation every 3 epochs (``main.py:116-118``),
- checkpoint every ``save_model_each`` epochs (``main.py:133-143``),
- metric aggregation identical to ``process_metrics`` (``src/utils.py:163``).

Observability goes beyond the reference (which has none, SURVEY.md §5): an
optional ``jax.profiler`` trace can be captured for the first epoch via
``cfg.profile_dir``.
"""

from __future__ import annotations

import logging
import random as pyrandom
import time
from typing import Callable, Optional

import jax

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data.pipeline import PatchDataset, make_batches
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.optim import set_learning_rate, steplr
from fluid_llm_tpu.train.trainer import Trainer, TrainState
from fluid_llm_tpu.utils import process_metrics

logger = logging.getLogger("fluid_llm_tpu.train")


def select_run_mode(trainer: Trainer, cfg: Config, epoch: int) -> tuple[Callable, str]:
    """``src/main.py:43-59``."""
    tf = cfg.teacher_forcing
    autoreg = (trainer.train_step_autoreg, "Autoreg")
    if tf.start_epoch != 0 and epoch < tf.start_epoch:
        return autoreg
    if pyrandom.random() < tf.tf_prob:
        return autoreg
    if tf.tf_mode == "gen":
        return trainer.train_step_gen, "Gen"
    if tf.tf_mode == "notf":
        return trainer.train_step_notf, "Gen"
    raise ValueError(f"Invalid configuration {tf.tf_mode}")


def _save_val_plots(trainer, state, batch, plot_dir: str, epoch: int) -> None:
    """Target-vs-prediction comparison frames for the first validation batch
    (``cfg.val_plot_dir``).  Goes beyond the reference, which only plots at
    inference (``src/inference.py:65-77``)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    pred, true = jax.device_get(
        trainer.val_rollout(state.trainable, state.frozen, batch)
    )
    pred, true = np.asarray(pred[0], np.float32), np.asarray(true[0], np.float32)
    out = os.path.join(plot_dir, f"epoch_{epoch:04d}")
    os.makedirs(out, exist_ok=True)
    steps = sorted({0, len(pred) // 2, len(pred) - 1})
    vmin, vmax = true[: len(pred), 0].min(), true[: len(pred), 0].max()
    for j in steps:
        fig, axes = plt.subplots(2, 1, figsize=(12, 6), dpi=80)
        for ax, img, title in zip(axes, (true[j, 0], pred[j, 0]), ("target", "prediction")):
            ax.imshow(np.flipud(img.T), vmin=vmin, vmax=vmax)
            ax.set_title(f"{title} (step {j})")
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out, f"step_{j}.png"))
        plt.close(fig)


def train_run(
    cfg: Config,
    trainer: Trainer,
    state: TrainState,
    train_ds: PatchDataset,
    valid_ds: PatchDataset,
    save_path: str = "",
    start_ep: int = 0,
    rng: Optional[jax.Array] = None,
    log_fn: Optional[Callable[[dict, int], None]] = None,
    mesh=None,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    lr_schedule = steplr(cfg.learning_rate, cfg.schedule_epoch, cfg.schedule_gamma)
    st = time.time()

    if mesh is not None:
        from fluid_llm_tpu.parallel.mesh import shard_batch

        place = lambda b: shard_batch(b, mesh)
    else:
        place = lambda b: b

    for epoch_idx in range(cfg.num_epochs):
        epoch = epoch_idx + start_ep
        # schedule indexed by the GLOBAL epoch: on resume the reference
        # restores scheduler state (``continue_train.py:35-36``), i.e. the
        # decay continues rather than restarting
        state.opt_state = set_learning_rate(state.opt_state, lr_schedule(epoch))
        step_fn, run_mode = select_run_mode(trainer, cfg, epoch)

        profiling = cfg.profile_dir and epoch_idx == 0
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)

        train_metrics = []
        for batch in make_batches(
            train_ds, cfg.batch_size, shuffle=True, seed=epoch,
            num_workers=cfg.num_workers,
        ):
            rng, step_rng = jax.random.split(rng)
            state.trainable, state.opt_state, metrics = step_fn(
                state.trainable, state.frozen, state.opt_state, place(batch), step_rng
            )
            # keep metrics on device: a per-step device_get would block host
            # dispatch every step; one bulk transfer at epoch end instead
            train_metrics.append(metrics)
        train_metrics = jax.device_get(train_metrics)
        if profiling:
            jax.profiler.stop_trace()

        train_log, loss, nrmse = process_metrics(train_metrics, run_mode, "train")
        train_log["lr"] = lr_schedule(epoch)

        if epoch_idx % 3 == 0:
            val_metrics, first_val = [], None
            for batch in make_batches(valid_ds, cfg.batch_size, shuffle=False):
                batch = place(batch)
                if first_val is None:
                    first_val = batch
                val_metrics.append(
                    trainer.val_step(state.trainable, state.frozen, batch)
                )
            val_metrics = jax.device_get(val_metrics)
            val_log, val_loss, val_nrmse = process_metrics(val_metrics, "Gen", "val")
            train_log.update(val_log)
            if cfg.val_plot_dir and first_val is not None:
                _save_val_plots(trainer, state, first_val, cfg.val_plot_dir, epoch)
        else:
            val_loss, val_nrmse = 0.0, 0.0

        if log_fn is not None:
            log_fn(train_log, epoch)

        t = time.time() - st
        st = time.time()
        logger.info(
            "Epoch %d: Training (Loss: %.4g | N_RMSE: %.5g) - "
            "Validation (Loss: %.4g | N_RMSE: %.5g)  Time: %.1f",
            epoch + 1, loss, nrmse, val_loss, val_nrmse, t,
        )

        if (
            cfg.save_on
            and save_path
            and cfg.save_model_each > 0
            and epoch_idx % cfg.save_model_each == 0
        ):
            state.epoch = epoch
            path = ckpt.save_checkpoint(save_path, epoch, state, cfg)
            logger.info("Saved checkpoint at epoch %d to %s", epoch, path)

    # the in-loop cadence only fires at multiples of ``save_model_each``, so
    # a run whose length is not a multiple would silently lose its final
    # epochs (the reference has the same quirk, ``src/main.py:133-143``);
    # always persist the final state unless the last epoch just saved
    if (
        cfg.save_on
        and save_path
        and cfg.num_epochs > 0  # a 0-epoch run has no final state to save
        # (and -1 % k == k-1 would otherwise fire a spurious step_-1 save)
        and cfg.save_model_each > 0
        and (cfg.num_epochs - 1) % cfg.save_model_each != 0
    ):
        state.epoch = start_ep + cfg.num_epochs - 1  # in-loop convention:
        # the epoch field records the just-completed epoch, matching the
        # step label so resume re-enters at the same point either way
        path = ckpt.save_checkpoint(save_path, state.epoch, state, cfg)
        logger.info("Saved final checkpoint at epoch %d to %s", state.epoch, path)
    state.epoch = start_ep + cfg.num_epochs
    return state
