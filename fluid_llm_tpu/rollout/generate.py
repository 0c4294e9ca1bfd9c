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


def _window_pos_ids(position_ids: jnp.ndarray, W: int) -> jnp.ndarray:
    """Window position ids: spatial ids from frame 0 (identical across
    frames), t = frame index (the re-zeroed layout, ``model.py:196-199``)."""
    bs, _, n, _ = position_ids.shape
    spatial = position_ids[:, :1, :, :2]  # (bs, 1, N, 2)
    spatial = jnp.broadcast_to(spatial, (bs, W, n, 2))
    t = jnp.broadcast_to(jnp.arange(W, dtype=position_ids.dtype)[None, :, None, None], (bs, W, n, 1))
    return jnp.concatenate([spatial, t], axis=-1)


def generate(
    model: FluidLLM,
    params: Params,
    init_states: jnp.ndarray,
    bc_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    n_steps: int,
    remat: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
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

    buffer = jnp.zeros((bs, W) + init_states.shape[2:], init_states.dtype)
    buffer = buffer.at[:, :init_len].set(init_states)
    wpos = _window_pos_ids(position_ids, W)

    def step(buffer, i):
        # frames in window *before* this prediction
        k = jnp.minimum(init_len + i, W)
        frame_valid = jnp.arange(W)[None, :] < k
        frame_valid = jnp.broadcast_to(frame_valid, (bs, W))

        # full-window backbone, single-frame decode (exact; see
        # ``FluidLLM.predict_frame_diff``) — prediction from the last valid
        # frame (``model.py:163``)
        last_img = model.predict_frame_diff(
            params, buffer, wpos, frame_valid, k - 1
        )  # (bs, 3, X, Y)
        diffs = img_to_patch(last_img[:, None], model.ds_props)[:, 0]  # (bs, N, 3, px, py)

        # bc forcing with the mask of the last available state (``model.py:202,206``)
        step_idx = jnp.minimum(init_len + i - 1, bc_mask.shape[1] - 1)
        mask = jax.lax.dynamic_index_in_dim(bc_mask, step_idx, 1, False)
        diffs = jnp.where(mask, 0.0, diffs)

        last_state = jax.vmap(lambda b, kk: jax.lax.dynamic_index_in_dim(b, kk, 0, False))(
            buffer, jnp.broadcast_to(k - 1, (bs,))
        )
        next_state = last_state + diffs

        # append: roll left if full, then write at min(k, W-1)
        full = (init_len + i) >= W
        shifted = jnp.where(full, jnp.roll(buffer, -1, axis=1), buffer)
        write_idx = jnp.minimum(k, W - 1)
        new_buffer = jax.vmap(
            lambda b, ns, wi: jax.lax.dynamic_update_index_in_dim(b, ns, wi, 0)
        )(shifted, next_state, jnp.broadcast_to(write_idx, (bs,)))
        return new_buffer, (next_state, diffs)

    step_fn = jax.checkpoint(step) if remat else step
    _, (next_states, all_diffs) = jax.lax.scan(step_fn, buffer, jnp.arange(n_steps))
    # scan stacks on axis 0 -> (steps, bs, ...); move to (bs, steps, ...)
    next_states = jnp.moveaxis(next_states, 0, 1)
    all_diffs = jnp.moveaxis(all_diffs, 0, 1)
    all_states = jnp.concatenate([init_states, next_states], axis=1)
    return all_states, all_diffs


def gen_seq(
    model: FluidLLM,
    params: Params,
    batch: tuple,
    pred_steps: int,
    start_state: int = 1,
    remat: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``model.py:218-233``: generate and reshape to image format."""
    states, _, _, bc_mask, position_ids = batch
    seq_len = states.shape[1]
    if pred_steps + start_state - 1 > seq_len:
        raise ValueError(
            f"Prediction steps ({pred_steps}) + start state ({start_state}) "
            f"must be less than total sequence length {seq_len}!"
        )
    init_state = states[:, :start_state]
    all_states, all_diffs = generate(
        model, params, init_state, bc_mask, position_ids, pred_steps, remat=remat
    )
    return patch_to_img(all_states, model.ds_props), patch_to_img(all_diffs, model.ds_props)
