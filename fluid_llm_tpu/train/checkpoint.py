"""Checkpoint save/restore carrying the reference payload, Orbax-backed.

The reference saves ``{'params': cfg, 'state_dict', 'optimizer', 'scheduler'}``
every ``save_model_each`` epochs (``src/main.py:133-143``) and rereads the
YAML copied next to the checkpoints on resume/inference
(``src/utils.py:124``, ``src/continue_train.py:48``, ``src/inference.py:170``).
TPU equivalent: an Orbax sharded checkpoint with the same logical payload —
``{cfg, trainable, frozen, opt_state, epoch}`` — restorable onto any mesh.

Folder layout mirrors ``make_save_folder``/``get_save_folder``
(``src/utils.py:128-160``): numbered run dirs, checkpoints named ``step_N``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.train.trainer import TrainState


def make_save_folder(base: str, name: Optional[str] = None, save_on: bool = True) -> str:
    """Create a numbered run folder (``src/utils.py:128-146``)."""
    if not save_on:
        return ""
    os.makedirs(base, exist_ok=True)
    if name is None:
        existing = [d for d in os.listdir(base) if re.fullmatch(r"\d+", d)]
        idx = max((int(d) for d in existing), default=-1) + 1
        name = f"{idx:03d}"
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    return path


def get_save_folder(base: str, idx: int = -1) -> str:
    """Look up a run folder by (natsorted) index (``src/utils.py:148-160``)."""
    runs = sorted(
        (d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))),
        key=lambda d: [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", d)],
    )
    if not runs:
        raise FileNotFoundError(f"No runs in {base}")
    return os.path.join(base, runs[idx])


def latest_step(save_path: str) -> Optional[int]:
    steps = [
        int(m.group(1))
        for d in os.listdir(save_path)
        if (m := re.fullmatch(r"step_(\d+)", d)) and os.path.isdir(os.path.join(save_path, d))
    ]
    return max(steps) if steps else None


def save_checkpoint(save_path: str, step: int, state: TrainState, cfg: Config) -> str:
    path = os.path.abspath(os.path.join(save_path, f"step_{step}"))
    payload = {
        "trainable": state.trainable,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    cfg.to_yaml(os.path.join(save_path, "config.yaml"))
    with open(os.path.join(save_path, f"step_{step}.epoch"), "w") as f:
        f.write(str(state.epoch if state.epoch else step))
    return path


def restore_checkpoint(save_path: str, step: int, like: TrainState) -> TrainState:
    """Restore into the structure of ``like`` (shapes/shardings preserved)."""
    path = os.path.abspath(os.path.join(save_path, f"step_{step}"))
    target = {
        "trainable": like.trainable,
        "frozen": like.frozen,
        "opt_state": like.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    epoch_file = os.path.join(save_path, f"step_{step}.epoch")
    epoch = step
    if os.path.exists(epoch_file):
        with open(epoch_file) as f:
            epoch = int(f.read().strip())
    return TrainState(
        trainable=restored["trainable"],
        frozen=restored["frozen"],
        opt_state=restored["opt_state"],
        epoch=epoch,
    )


def load_config(save_path: str) -> Config:
    return Config.from_yaml(os.path.join(save_path, "config.yaml"))
