"""Resume training from a saved checkpoint.

Equivalent of ``src/continue_train.py:22-76`` but without the hardcoded run
folder/step: the run is selected by folder index (latest by default), the
saved YAML is reread, model/optimizer state restored, and training re-enters
the epoch loop at ``start_ep``.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax

from fluid_llm_tpu.data import get_dataset
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.loop import train_run
from fluid_llm_tpu.utils import set_seed

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.continue_train")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", default="model_checkpoints")
    parser.add_argument("--load_no", type=int, default=-1)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--metrics_jsonl", default=None,
                        help="append per-epoch metrics to this JSONL "
                             "(same sink main.py --metrics_jsonl uses)")
    args = parser.parse_args(argv)

    load_path = ckpt.get_save_folder(args.checkpoint_dir, args.load_no)
    cfg = ckpt.load_config(load_path)
    step = args.step if args.step is not None else ckpt.latest_step(load_path)
    logger.info("Resuming from %s step_%s", load_path, step)

    rng = set_seed(cfg.seed)
    train_ds = get_dataset(cfg.replace(seq_len=cfg.autoreg_seq_len), mode="train")
    valid_ds = get_dataset(cfg.replace(seq_len=cfg.val_seq_len), mode="valid")

    # rebuild the mesh from cfg.parallel and restore INTO sharded arrays —
    # a run trained over a mesh resumes sharded, not single-device-placed
    from fluid_llm_tpu.main import init_state_and_mesh

    model, trainer, like, mesh = init_state_and_mesh(
        cfg, train_ds.ds_props(), jax.random.PRNGKey(0)
    )
    state = ckpt.restore_checkpoint(load_path, step, like)
    if mesh is not None:
        logger.info("Restored onto mesh %s", dict(mesh.shape))

    log_fn = None
    if args.metrics_jsonl:
        f = open(args.metrics_jsonl, "a")
        log_fn = lambda m, e: (f.write(json.dumps({"epoch": e, **m}) + "\n"), f.flush())

    train_run(
        cfg, trainer, state, train_ds, valid_ds,
        save_path=load_path, start_ep=state.epoch, rng=rng, mesh=mesh,
        log_fn=log_fn,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
