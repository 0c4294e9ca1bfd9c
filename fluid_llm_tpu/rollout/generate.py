"""Autoregressive rollout as a ``lax.scan`` over a fixed-shape window buffer.

The reference generates with a Python loop over a ``deque(maxlen=max_ctx_len)``
of states, re-encoding the whole window every step
(``src/models/model.py:168-216``).  Semantics preserved here:

- the window grows from ``init_len`` up to ``max_ctx_len`` frames, then
  slides (oldest dropped);
- time position-ids are re-zeroed per window (``model.py:196-199``) — in the
  left-aligned fixed buffer, frame ``i`` simply has ``t = i``;
- boundary-condition pixels are forced to zero diff (``model.py:206``);
- ``see_init_state`` duplicates the window's first frame (``model.py:118``).

TPU-first: the buffer is a fixed ``(bs, W, N_patch, 3, px, py)`` array carried
through ``lax.scan``; not-yet-filled frames sit *after* the valid ones, so
causal attention alone hides them from valid queries, and the whole rollout
jit-compiles to a single device program (one compile, no per-step dispatch).

No KV cache — matching the reference — because the learned time-embedding is
re-zeroed per window, which changes every token's embedding as the window
slides; a cache would be semantically wrong.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.ops.patching import img_to_patch, patch_to_img

Params = dict[str, Any]


def generate(
    model: FluidLLM,
    params: Params,
    init_states: jnp.ndarray,
    bc_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    n_steps: int,
    remat: bool = False,
    collect_moe_aux: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """``model.py:168-216`` as a scan.

    init_states: (bs, init_len, N_patch, 3, px, py) patch states.
    bc_mask:     (bs, seq, N_patch, 3, px, py) bool.
    position_ids:(bs, seq, N_patch, 3).
    remat:       rematerialise each scan step — needed when differentiating
                 through the rollout (the ``notf`` training mode) at full
                 scale, trading recompute for activation memory.
    Returns (all_states, all_diffs) as patch tensors of
    (bs, init_len + n_steps, ...) / (bs, n_steps, ...).
    """
    bs, init_len, n_patch = init_states.shape[:3]
    W = model.max_ctx_len

    # RIGHT-aligned window: the newest frame always sits at index W-1, so
    # the single-frame decode slice is static for every step.  Not-yet-
    # filled slots occupy the *front* and are masked out of attention
    # (cumsum-based positions in the backbone keep learned-position indices
    # identical to the dense computation).
    buffer = jnp.zeros((bs, W) + init_states.shape[2:], init_states.dtype)
    buffer = buffer.at[:, W - init_len:].set(init_states)
    spatial = jnp.broadcast_to(
        position_ids[:, :1, :, :2], (bs, W, n_patch, 2)
    ).astype(position_ids.dtype)
    # the see-init duplicated frame always carries t=0 (window-relative mode)
    dup_pos = jnp.concatenate(
        [spatial[:, 0], jnp.zeros((bs, n_patch, 1), position_ids.dtype)], axis=-1
    )
    slot = jnp.arange(W)[None, :]
    # absolute-time variant (``Config.absolute_time_ids``): t ids follow the
    # trajectory step instead of being re-zeroed per window, so the exact
    # rollout evaluates streaming-native models consistently
    abs_t = model.cfg.absolute_time_ids
    t0 = position_ids[:, 0, 0, 2].astype(position_ids.dtype)  # window base step

    def step(buffer, i):
        k = jnp.minimum(init_len + i, W)  # frames currently in the window
        start = W - k
        frame_valid = jnp.broadcast_to(slot >= start, (bs, W))
        if abs_t:
            # valid slot j holds RAW trajectory step t0 + ((init_len+i) - W
            # + j) * seq_interval — frames are seq_interval raw steps apart
            ival = model.cfg.seq_interval
            t_ids = jnp.maximum(t0[:, None] + (init_len + i - W + slot) * ival, 0)
            t_ids = t_ids.astype(position_ids.dtype)
            dup_t = (t0 + jnp.maximum(init_len + i - W, 0) * ival).astype(position_ids.dtype)
            dpos = jnp.concatenate(
                [spatial[:, 0],
                 jnp.broadcast_to(dup_t[:, None, None], (bs, n_patch, 1))],
                axis=-1,
            )
        else:
            # re-zeroed time ids (``model.py:196-199``): valid frame j -> j-start
            t_ids = jnp.maximum(slot - start, 0).astype(position_ids.dtype)
            t_ids = jnp.broadcast_to(t_ids, (bs, W))
            dpos = dup_pos
        wpos = jnp.concatenate(
            [spatial, jnp.broadcast_to(t_ids[:, :, None, None], (bs, W, n_patch, 1))],
            axis=-1,
        )
        # see-init duplicates the first *valid* frame (``model.py:118-126``)
        first_valid = jax.vmap(
            lambda b, s: jax.lax.dynamic_index_in_dim(b, s, 0, False)
        )(buffer, jnp.broadcast_to(start, (bs,)))

        # full-window backbone, static single-frame decode (exact; see
        # ``FluidLLM.predict_frame_diff``) — prediction from the last frame
        # (``model.py:163``)
        aux_list = [] if collect_moe_aux else None
        last_img = model.predict_frame_diff(
            params, buffer, wpos, frame_valid, W - 1,
            init_frame=(first_valid, dpos), moe_aux=aux_list,
        )
        # per-step MoE load-balance aux (mean over blocks) rides the scan
        # outputs so the notf training mode — whose gradient-bearing forward
        # IS this rollout — can weight it into the loss
        aux_step = (sum(aux_list) / len(aux_list)) if aux_list \
            else jnp.zeros((), jnp.float32)
        diffs = img_to_patch(last_img[:, None], model.ds_props)[:, 0]

        # bc forcing with the mask of the last available state
        # (``model.py:202,206``)
        step_idx = jnp.minimum(init_len + i - 1, bc_mask.shape[1] - 1)
        mask = jax.lax.dynamic_index_in_dim(bc_mask, step_idx, 1, False)
        diffs = jnp.where(mask, 0.0, diffs)

        next_state = buffer[:, W - 1] + diffs
        new_buffer = jnp.concatenate([buffer[:, 1:], next_state[:, None]], axis=1)
        return new_buffer, (next_state, diffs, aux_step)

    step_fn = jax.checkpoint(step) if remat else step
    _, (next_states, all_diffs, aux_steps) = jax.lax.scan(
        step_fn, buffer, jnp.arange(n_steps)
    )
    # scan stacks on axis 0 -> (steps, bs, ...); move to (bs, steps, ...)
    next_states = jnp.moveaxis(next_states, 0, 1)
    all_diffs = jnp.moveaxis(all_diffs, 0, 1)
    all_states = jnp.concatenate([init_states, next_states], axis=1)
    if collect_moe_aux:
        return all_states, all_diffs, jnp.mean(aux_steps)
    return all_states, all_diffs


def gen_seq(
    model: FluidLLM,
    params: Params,
    batch: tuple,
    pred_steps: int,
    start_state: int = 1,
    remat: bool = False,
    collect_moe_aux: bool = False,
) -> tuple[jnp.ndarray, ...]:
    """``model.py:218-233``: generate and reshape to image format.

    ``collect_moe_aux``: additionally return the rollout-mean MoE
    load-balance loss (the ``notf`` mode's gradient-bearing forward is this
    rollout, so its router balance term must come from here)."""
    states, _, _, bc_mask, position_ids = batch
    seq_len = states.shape[1]
    if pred_steps + start_state - 1 > seq_len:
        raise ValueError(
            f"Prediction steps ({pred_steps}) + start state ({start_state}) "
            f"must be less than total sequence length {seq_len}!"
        )
    init_state = states[:, :start_state]
    out = generate(
        model, params, init_state, bc_mask, position_ids, pred_steps,
        remat=remat, collect_moe_aux=collect_moe_aux,
    )
    all_states, all_diffs = out[0], out[1]
    imgs = (patch_to_img(all_states, model.ds_props),
            patch_to_img(all_diffs, model.ds_props))
    return imgs + ((out[2],) if collect_moe_aux else ())
