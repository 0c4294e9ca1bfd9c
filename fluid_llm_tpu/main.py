"""Training entrypoint (equivalent of ``src/main.py:175-209``).

Usage:
    python -m fluid_llm_tpu.main --config_path configs/training1.yaml \
        [--save_folder NAME]

Differences from the reference, by design:
- distribution comes from ``cfg.parallel`` (mesh axes) instead of
  ``accelerate launch`` — a single process drives all local devices;
- wandb is optional and off by default (no egress); metrics go to stdout
  and an optional JSONL file.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data import get_dataset
from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.models.hf_import import bos_embedding, load_pretrained
from fluid_llm_tpu.parallel.mesh import make_mesh, shard_params
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.loop import train_run
from fluid_llm_tpu.train.optim import partition
from fluid_llm_tpu.train.trainer import Trainer, TrainState
from fluid_llm_tpu.utils import count_params, set_seed

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.main")


def finish_state(params, model: FluidLLM, trainer: Trainer, cfg: Config):
    """Shard (devices > 1), partition and build optimizer state.

    Shared by fresh training, resume and inference so a run trained over a
    mesh restores *into sharded* arrays (Orbax restores with the template's
    shardings) instead of single-device placement.
    """
    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(cfg.parallel)
        params = shard_params(params, mesh, cfg.parallel)

    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    if cfg.frozen_bf16:
        from fluid_llm_tpu.train.trainer import cast_frozen_bf16

        frozen = cast_frozen_bf16(frozen)
    opt_state = trainer.opt.init(trainable)
    if mesh is not None:
        # moment leaves inherit the trainable sharding through opt.init, but
        # scalar leaves (Adam count, MultiSteps counters) come back
        # uncommitted — commit them replicated so a checkpoint restored into
        # this template is consistently mesh-placed
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        opt_state = jax.tree_util.tree_map(
            lambda x: x if isinstance(getattr(x, "sharding", None), NamedSharding)
            else jax.device_put(x, rep),
            opt_state,
        )
    return TrainState(trainable=trainable, frozen=frozen, opt_state=opt_state), mesh


def init_state_and_mesh(cfg: Config, ds_props, rng):
    """Model + random-init state sharded per ``cfg.parallel`` — the restore
    template for resume/inference (``src/continue_train.py:22-37``)."""
    model = FluidLLM.build(cfg, ds_props)
    trainer = Trainer(model)
    params = model.init(rng)
    state, mesh = finish_state(params, model, trainer, cfg)
    return model, trainer, state, mesh


def build_model_and_state(cfg: Config, ds_props, rng):
    model = FluidLLM.build(cfg, ds_props)
    trainer = Trainer(model)
    params = model.init(rng)

    # pretrained import when the HF cache has the weights (``model.py:46-55``)
    loaded = load_pretrained(cfg.llm_backbone, cfg.llm_layers)
    if loaded is not None:
        # HF import returns the per-layer LIST layout; re-stack below if the
        # template (model.init) used the stacked pipeline layout
        hf_params, embed_tokens, bcfg = loaded
        params["backbone"] = jax.tree_util.tree_map(jax.numpy.asarray, hf_params)
        if cfg.use_bos_token:
            params["bos"] = bos_embedding(embed_tokens, bcfg)
        logger.info("Loaded pretrained backbone %s", cfg.llm_backbone)
    else:
        logger.info("Pretrained %s unavailable; using random init", cfg.llm_backbone)

    # quantized backbone storage (reference's 4-bit loading flag,
    # ``model.py:51``): QLoRA-style packed nf4 — only valid for a frozen base
    if cfg.llm_4bit_loading and (cfg.use_lora or cfg.freeze_llm):
        from fluid_llm_tpu.models import backbone as bb
        from fluid_llm_tpu.ops.quant import quantize_backbone

        params["backbone"] = quantize_backbone(
            bb.unstack_layers(params["backbone"]), mode="nf4"
        )
        logger.info("Quantized backbone weights to packed nf4 storage")

    if cfg.parallel.pipe_axis > 1:
        from fluid_llm_tpu.models import backbone as bb

        # pipeline stages slice the STACKED leaves; HF import / quantization
        # above leave the list layout
        params["backbone"] = bb.stack_layers(params["backbone"])
        if isinstance(params["backbone"]["layers"], list):
            raise ValueError(
                "pipeline parallelism needs homogeneous stackable layers — "
                "the loaded/quantized backbone could not be stacked "
                "(quantized storage with mixed shapes does not stack; "
                "serve quantized models without pipe_axis)"
            )

    state, mesh = finish_state(params, model, trainer, cfg)
    logger.info(
        "The model has %d trainable parameters (%d frozen)",
        count_params(state.trainable), count_params(state.frozen),
    )
    return model, trainer, state, mesh


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="configs/training1.yaml")
    parser.add_argument("--save_folder", default=None)
    parser.add_argument("--metrics_jsonl", default=None)
    # multi-host (DCN) launch — the TPU equivalent of the reference's
    # ``accelerate launch`` multi-process DDP (``run_training.sh:5``,
    # ``src/main.py:150-152``).  On TPU pods jax.distributed auto-detects
    # everything; on other fabrics pass the coordinator explicitly.
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize before device use")
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.distributed:
        kw = {}
        if args.coordinator_address is not None:
            if args.num_processes is None or args.process_id is None:
                parser.error(
                    "--coordinator_address requires --num_processes and "
                    "--process_id (all three together; omit all three on "
                    "TPU pods, which auto-detect the coordinator)"
                )
            kw = dict(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        jax.distributed.initialize(**kw)
        logger.info(
            "jax.distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    cfg = Config.from_yaml(args.config_path)
    rng = set_seed(cfg.seed)
    logger.info("Parameters for training: %s", cfg.to_dict())

    # per-role seq_len overrides (``main.py:181-186``)
    train_ds = get_dataset(cfg.replace(seq_len=cfg.autoreg_seq_len), mode="train")
    valid_ds = get_dataset(cfg.replace(seq_len=cfg.val_seq_len), mode="valid")
    ds_props = train_ds.ds_props()

    model, trainer, state, mesh = build_model_and_state(cfg, ds_props, rng)

    save_path = ""
    if cfg.save_on:
        save_path = ckpt.make_save_folder(cfg.checkpoint_save_path, args.save_folder)
        cfg.to_yaml(f"{save_path}/config.yaml")
        logger.info("Saving checkpoints to: %s", save_path)

    sinks = []
    if args.metrics_jsonl:
        f = open(args.metrics_jsonl, "a")
        sinks.append(lambda m, e: (f.write(json.dumps({"epoch": e, **m}) + "\n"), f.flush()))

    # optional wandb, as in the reference (``src/main.py:154-167``); degrades
    # gracefully when the package or network is absent
    wandb_run = None
    if cfg.enable_wandb:
        try:
            import wandb

            tag = "airfoil" if "airfoil" in cfg.load_dir else "25_validation"
            wandb_run = wandb.init(
                project="llm4multivariatets", tags=[tag], config=cfg.to_dict()
            )
            sinks.append(lambda m, e: wandb.log(m, step=e))
        except Exception as e:  # no wandb / no egress
            logger.warning("wandb unavailable (%s); continuing without", e)

    log_fn = (lambda m, e: [s(m, e) for s in sinks]) if sinks else None

    train_run(cfg, trainer, state, train_ds, valid_ds, save_path, rng=rng, log_fn=log_fn, mesh=mesh)
    if wandb_run is not None:
        wandb_run.finish()


if __name__ == "__main__":
    main(sys.argv[1:])
