"""Optimizers, StepLR schedule, and trainable/frozen param partitioning.

Equivalent of ``Trainer.prepare_optimizers`` (``src/trainer.py:222-247``):
AdamW / Adam / SGD with torch-style L2 semantics plus ``StepLR(step_size,
gamma)`` stepped once per epoch (``src/main.py:82``).

Frozen parameters (the pretrained backbone under LoRA / ``freeze_llm``) are
partitioned *out* of the optimizer: no moments are allocated for them — the
TPU-native analogue of peft only passing trainable params to the optimizer.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from fluid_llm_tpu.config import Config

Params = dict[str, Any]


def partition(params: Params, mask: Params) -> tuple[Params, Params]:
    """Split params into (trainable, frozen) trees with None placeholders."""
    trainable = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine(trainable: Params, frozen: Params) -> Params:
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def steplr(base_lr: float, step_size: int, gamma: float):
    """torch ``StepLR``: lr * gamma**(epoch // step_size)."""

    def schedule(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Optimizer with an injectable learning rate (set per epoch by the loop)."""
    wd = cfg.weight_decay

    if cfg.optimizer == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=wd
        )
    elif cfg.optimizer == "adam":
        # torch Adam applies weight decay as L2 on the gradient before moments
        def adam_l2(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
            )

        opt = optax.inject_hyperparams(adam_l2)(learning_rate=cfg.learning_rate)
    elif cfg.optimizer == "adafactor":
        # TPU-native addition (no reference equivalent — upstream only ever
        # instantiates Adam/AdamW, ``src/trainer.py``): factored second
        # moment keeps full-finetune optimizer state O(rows+cols) instead of
        # O(rows*cols), the difference between fitting and not fitting a
        # full-FT LLaMA-7B step on a 16 GiB v5e chip (see
        # ``__graft_entry__.dryrun_fullshape``).
        # min_dim_size_to_factor must stay a static python int: adafactor's
        # init branches on it per-leaf (optax factorized.py:55), which
        # breaks under jit if inject_hyperparams turns it into a tracer
        opt = optax.inject_hyperparams(
            optax.adafactor, static_args=("min_dim_size_to_factor",)
        )(
            learning_rate=cfg.learning_rate,
            weight_decay_rate=wd if wd else None,
        )
    elif cfg.optimizer == "sgd":

        def sgd_l2(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(learning_rate),
            )

        opt = optax.inject_hyperparams(sgd_l2)(learning_rate=cfg.learning_rate)
    else:
        raise ValueError(f"Unknown optimizer type: {cfg.optimizer}")
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # the reference's ``accelerator.accumulate`` (``src/main.py:68``):
        # average grads over k micro-batches, update every k-th step
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place-ish (returns new state)."""
    target = opt_state
    if hasattr(target, "inner_opt_state"):  # optax.MultiSteps wrapper
        target = target.inner_opt_state
    target.hyperparams["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return opt_state
