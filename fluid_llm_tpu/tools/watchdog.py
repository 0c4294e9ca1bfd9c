"""Auto-resume training supervisor (elastic aux subsystem, beyond parity).

The reference has no failure handling (SURVEY.md §5): a preemption or crash
loses the run.  This watchdog wraps the training entrypoints in a
supervise-and-resume loop built on the checkpoint/resume machinery:

    python -m fluid_llm_tpu.tools.watchdog --config_path configs/training1.yaml

- first attempt runs ``fluid_llm_tpu.main`` (fresh training);
- on a non-zero exit, it relaunches ``fluid_llm_tpu.continue_train`` from
  the newest checkpoint in the run folder — repeatedly, with exponential
  backoff, until the run completes or ``--max_restarts`` is exhausted;
- if no checkpoint was ever written the fresh entrypoint is retried;
- a crash *loop* (failure before any new checkpoint appears twice in a row)
  still counts against the restart budget, so a deterministic fault cannot
  spin forever.

Child processes run unmodified entrypoints — the watchdog is pure process
supervision and owns no training state, so it composes with the mesh,
quantization and streaming options transparently.
"""

from __future__ import annotations

import argparse
import logging
import os
import subprocess
import sys
import time

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.watchdog")


def _latest_run_state(checkpoint_dir: str):
    """(run folder, newest step) or (None, None) if nothing usable exists."""
    from fluid_llm_tpu.train import checkpoint as ckpt

    try:
        folder = ckpt.get_save_folder(checkpoint_dir, -1)
        step = ckpt.latest_step(folder)
    except (FileNotFoundError, ValueError, OSError):
        return None, None
    return (folder, step) if step is not None else (None, None)


def supervise(
    config_path: str,
    checkpoint_dir: str,
    max_restarts: int = 5,
    backoff_s: float = 10.0,
    extra_env: dict | None = None,
    python: str = sys.executable,
) -> int:
    """Run training under supervision; returns the final exit code."""
    env = dict(os.environ, **(extra_env or {}))
    restarts = 0
    while True:
        folder, step = _latest_run_state(checkpoint_dir)
        if folder is None:
            cmd = [python, "-m", "fluid_llm_tpu.main", "--config_path", config_path]
        else:
            cmd = [
                python, "-m", "fluid_llm_tpu.continue_train",
                "--checkpoint_dir", checkpoint_dir,
            ]
            logger.info("Resuming from %s step_%s", folder, step)
        logger.info("Launching (attempt %d): %s", restarts + 1, " ".join(cmd))
        rc = subprocess.run(cmd, env=env).returncode
        if rc == 0:
            logger.info("Training completed cleanly")
            return 0
        restarts += 1
        if restarts > max_restarts:
            logger.error("Exit code %d; restart budget (%d) exhausted", rc, max_restarts)
            return rc
        delay = backoff_s * (2 ** (restarts - 1))
        logger.warning(
            "Exit code %d; restart %d/%d in %.0fs", rc, restarts, max_restarts, delay
        )
        time.sleep(delay)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="configs/training1.yaml")
    parser.add_argument("--checkpoint_dir", default=None,
                        help="defaults to the config's checkpoint_save_path")
    parser.add_argument("--max_restarts", type=int, default=5)
    parser.add_argument("--backoff_s", type=float, default=10.0)
    args = parser.parse_args(argv)

    checkpoint_dir = args.checkpoint_dir
    if checkpoint_dir is None:
        from fluid_llm_tpu.config import Config

        checkpoint_dir = Config.from_yaml(args.config_path).checkpoint_save_path
    sys.exit(supervise(
        args.config_path, checkpoint_dir,
        max_restarts=args.max_restarts, backoff_s=args.backoff_s,
    ))


if __name__ == "__main__":
    main(sys.argv[1:])
