"""Training/validation step logic: the three step modes of the reference.

Equivalent of ``src/trainer.py:16-220``:

- ``autoreg``  (``run_train_step``, :72):   teacher-forced one-step diffs,
  optional input noise scaled by the per-batch diff std (:83-87).
- ``gen``      (``run_gen_train_step``, :122): a no-grad rollout produces
  guide states; the model is trained on single-step corrections from them.
- ``notf``     (``run_notf_train_step``, :162): loss through the full
  generated rollout (gradients flow through the scan).
- ``val``      (``run_val_step``, :196): full-sequence rollout + N-RMSE.

Known reference defects, knowingly corrected (both code paths are dormant
upstream — ``teacher_forcing.start_epoch=10000`` keeps them unreachable):
``run_gen_train_step`` drops the last guide frame and ``run_notf_train_step``
rolls one step short, so both would shape-error against their 1-frame-longer
targets.  Here guide/rollout lengths line up with the targets.

Each step is a single jitted function over (trainable, frozen, opt_state,
batch); gradients and optimizer state exist only for trainable leaves.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.ops.patching import img_to_patch, patch_to_img
from fluid_llm_tpu.rollout.generate import gen_seq
from fluid_llm_tpu.train.losses import combined_loss
from fluid_llm_tpu.train.metrics import calc_n_rmse, normalise_states
from fluid_llm_tpu.train.optim import build_optimizer, combine, partition

Params = dict[str, Any]
Batch = tuple  # (states, next_state, diffs, bc_mask, position_ids)


def cast_frozen_bf16(frozen: Params) -> Params:
    """Cast the frozen BACKBONE subtree's f32 leaves to bf16
    (``cfg.frozen_bf16``).

    Reference parity: upstream loads the whole backbone in torch bf16 and
    trains f32 adapters over it (``/root/reference/src/models/model.py:46-55``);
    we keep f32 frozen masters by default and make the bf16 storage opt-in.
    Only the backbone subtree is cast (frozen encoder/decoder leaves, if
    any, keep their dtype); quantized storage dicts (``ops/quant.py``:
    int8/nf4 ``{"q": int8, "scale"/"absmax"...: f32}``) pass through
    WHOLE — their f32 scale chains carry the dynamic range and casting
    them would stack rounding error for no meaningful memory win.
    The forward already casts weights to the activation dtype, so this is
    purely a storage change.
    """
    def is_quant(node):
        # quantized storage = {"q": int8/uint8 array, "scale"/"absmax"...}.
        # NOT just `"q" in node`: the attention param dict also has a "q"
        # key (the query projection — a dict, not an int array)
        q = node.get("q") if isinstance(node, dict) else None
        return hasattr(q, "dtype") and jnp.issubdtype(q.dtype, jnp.integer)

    def cast(x):
        if is_quant(x):
            return x
        if x is not None and getattr(x, "dtype", None) == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    out = dict(frozen)
    if "backbone" in out:
        out["backbone"] = jax.tree_util.tree_map(
            cast, out["backbone"], is_leaf=is_quant
        )
    return out


@dataclass
class TrainState:
    trainable: Params
    frozen: Params
    opt_state: Any
    epoch: int = 0

    @property
    def params(self) -> Params:
        return combine(self.trainable, self.frozen)


class Trainer:
    def __init__(self, model: FluidLLM):
        self.model = model
        self.cfg = model.cfg
        self.opt = build_optimizer(self.cfg)

        self.train_step_autoreg = jax.jit(partial(self._train_step, mode="autoreg"),
                                          static_argnames=("mode",), donate_argnums=(0, 2))
        self.train_step_gen = jax.jit(partial(self._train_step, mode="gen"),
                                      static_argnames=("mode",), donate_argnums=(0, 2))
        self.train_step_notf = jax.jit(partial(self._train_step, mode="notf"),
                                       static_argnames=("mode",), donate_argnums=(0, 2))
        self.val_step = jax.jit(self._val_step)
        self.val_rollout = jax.jit(self._val_rollout)

    # -- state --------------------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        params = self.model.init(key)
        mask = self.model.trainable_mask(params)
        trainable, frozen = partition(params, mask)
        if self.cfg.frozen_bf16:
            frozen = cast_frozen_bf16(frozen)
        opt_state = self.opt.init(trainable)
        return TrainState(trainable=trainable, frozen=frozen, opt_state=opt_state)

    # -- losses per mode ----------------------------------------------------

    def _mode_loss(self, params: Params, batch: Batch, rng, mode: str):
        cfg, model = self.cfg, self.model
        states, next_state, diffs, bc_mask, position_ids = batch
        r_noise, r_model = jax.random.split(rng)
        # MoE backbones: collect per-block load-balance losses (weighted into
        # the loss below).  Only gradient-bearing forwards count: ``gen``'s
        # stop-gradient guide rollout runs without a collector, while
        # ``notf``'s rollout IS its gradient-bearing forward, so its aux is
        # threaded out of the scan (``gen_seq(collect_moe_aux=True)``)
        moe_aux = [] if model.backbone_cfg.moe_experts > 0 else None

        if mode == "autoreg":
            if cfg.noise is not None:
                std = jnp.std(diffs, axis=(-1, -2, -3, -4, -5), keepdims=True, ddof=1)
                noise = (
                    jax.random.normal(r_noise, states.shape, states.dtype)
                    * (~bc_mask).astype(states.dtype) * std * cfg.noise
                )
                input_states = states + noise
            else:
                input_states = states
            pred_diff = model.predict_diffs(
                params, input_states, position_ids, train=True, rng=r_model,
                moe_aux=moe_aux,
            )
            base_img = patch_to_img(input_states, model.ds_props)
            pred_state = base_img + pred_diff
        elif mode == "gen":
            seq_len = states.shape[1]
            guide_img, _ = gen_seq(model, jax.lax.stop_gradient(params), batch, seq_len - 1)
            guide_img = jax.lax.stop_gradient(guide_img)
            guide_patch = img_to_patch(guide_img, model.ds_props)
            pred_diffs = model.forward_see_init(
                params, guide_patch, position_ids, train=True, rng=r_model,
                moe_aux=moe_aux,
            )
            pred_state = guide_img + pred_diffs
        elif mode == "notf":
            seq_len = states.shape[1]
            # gradients flow through the whole rollout; remat the scan steps
            # when configured so activation memory stays bounded
            out = gen_seq(
                model, params, batch, seq_len, remat=cfg.parallel.remat,
                collect_moe_aux=moe_aux is not None,
            )
            pred_state = out[0][:, 1:]
            if moe_aux is not None:
                moe_aux.append(out[2])
        else:
            raise ValueError(mode)

        next_img = patch_to_img(next_state, model.ds_props)
        mask_img = patch_to_img(bc_mask.astype(jnp.float32), model.ds_props).astype(bool)

        if cfg.loss_norm_eps is not None:
            norm_next, norm_pred = normalise_states(
                diffs, next_img, pred_state, cfg.loss_norm_eps, cfg.channel_independent
            )
            loss, all_losses = combined_loss(
                norm_pred, norm_next, mask_img,
                cfg.loss_function, cfg.loss_weighting, cfg.pressure_weight,
            )
        else:
            loss, all_losses = combined_loss(
                pred_state, next_img, mask_img,
                cfg.loss_function, cfg.loss_weighting, cfg.pressure_weight,
            )

        if moe_aux:
            aux = sum(moe_aux) / len(moe_aux)
            loss = loss + cfg.moe.aux_weight * aux
            all_losses["moe_aux"] = aux

        n_rmse = calc_n_rmse(
            jax.lax.stop_gradient(pred_state), next_img, mask_img
        )
        all_losses["loss"] = loss
        all_losses["N_RMSE"] = n_rmse
        return loss, all_losses

    # -- steps --------------------------------------------------------------

    def _train_step(self, trainable, frozen, opt_state, batch, rng, *, mode: str):
        def loss_fn(tr):
            params = combine(tr, frozen)
            return self._mode_loss(params, batch, rng, mode)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = self.opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    def _val_step(self, trainable, frozen, batch):
        """``run_val_step`` (``trainer.py:196-220``)."""
        params = combine(trainable, frozen)
        model, cfg = self.model, self.cfg
        states, _, _, bc_mask, position_ids = batch
        seq_len = states.shape[1]
        pred_states, _ = gen_seq(model, params, batch, seq_len)
        pred_states = pred_states[:, :-1]

        states_img = patch_to_img(states, model.ds_props)
        mask_img = patch_to_img(bc_mask.astype(jnp.float32), model.ds_props).astype(bool)

        loss, all_losses = combined_loss(
            pred_states, states_img, mask_img,
            cfg.loss_function, cfg.loss_weighting, cfg.pressure_weight,
        )
        all_losses["loss"] = loss
        all_losses["N_RMSE"] = calc_n_rmse(pred_states, states_img, mask_img)
        return all_losses

    def _val_rollout(self, trainable, frozen, batch):
        """Predicted and target image sequences for one batch — the plotting
        twin of ``_val_step`` (no losses; feeds ``cfg.val_plot_dir`` figures,
        a capability the reference lacks: it only plots at inference,
        ``src/inference.py:65-77``)."""
        params = combine(trainable, frozen)
        states = batch[0]
        seq_len = states.shape[1]
        pred_states, _ = gen_seq(self.model, params, batch, seq_len)
        return pred_states[:, :-1], patch_to_img(states, self.model.ds_props)
