"""Streaming rollout: encode each frame ONCE against a KV cache.

TPU-native serving addition with no reference counterpart.  The reference
(and the exact rollout in ``rollout/generate.py``) re-encodes the whole
10-frame window for every generated step (``src/models/model.py:168-216``)
because its positional scheme is window-relative: the learned time table is
re-zeroed per window and ``rotary3d`` normalises by the batch max, so every
token's embedding changes as the window slides and nothing can be cached.

This path trades that semantics for standard sliding-window LLM serving:

- input embeddings are the cache-stable ``rope_abs`` variant (static
  spatial scales, absolute time — ``models/embeddings.py``),
- the backbone uses rotary token positions (llama family), monotonic over
  the whole rollout,
- the BOS token and the see-init duplicate of the TRUE initial state are
  pinned "attention sinks" (never evicted), and the last ``max_ctx_len``
  frames live in a slot-aligned ring (``backbone.init_streaming_cache``),
- each new frame runs through all blocks ONCE (N_patch tokens instead of
  the full ~661-token window) and its K/V are frozen in the cache.

Equal by construction to dense attention under a banded mask (verified in
``tests/test_streaming.py``), NOT to the re-encoding rollout — this is an
opt-in serving mode for rope-backbone models, selected with
``inference.py --streaming``.  Per-step backbone FLOPs drop by ~W× (the
window length); see BENCHMARKS.md for measured throughput.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.ops.patching import img_to_patch, patch_to_img

Params = dict[str, Any]


def _check_streaming_compat(model: FluidLLM) -> None:
    if model.backbone_cfg.pos != "rope":
        raise ValueError(
            "streaming rollout needs a rotary-position backbone (llama "
            f"family); {model.cfg.llm_backbone!r} uses learned positions "
            "that are re-based per window and cannot be cached"
        )
    if model.cfg.pos_embedding_params.pos_embedding_type != "rope_abs":
        raise ValueError(
            "streaming rollout needs cache-stable input embeddings: set "
            "pos_embedding_params.pos_embedding_type: rope_abs (the 'pos' "
            "table is window-re-zeroed and 'rope' normalises by batch max)"
        )
    if model.cfg.decoder_params.type == "CNN":
        raise ValueError(
            "streaming rollout cannot serve the CNN patch decoder: its "
            "Conv1d spans the whole window's token stream "
            "(patch_decoder.py:44-52), but streaming decodes one frame's "
            "tokens at a time — a per-frame conv would silently compute a "
            "different function than training did; use the exact rollout"
        )
    if not model.cfg.absolute_time_ids:
        raise ValueError(
            "streaming rollout needs absolute_time_ids: true — a model "
            "trained on window-relative t in 0..seq_len-1 would see the "
            "monotonically growing serving t far outside its training "
            "distribution (silent accuracy loss, not an error)"
        )


def generate_streaming(
    model: FluidLLM,
    params: Params,
    init_states: jnp.ndarray,
    bc_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    n_steps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``rollout.generate.generate`` (patch tensors in/out).

    ``params`` should be ``prepare_inference_params`` output (merged LoRA +
    fused qkv).  Raw adapter-carrying params are merged here on the fly —
    ``apply_streaming`` uses plain linears, so unmerged adapters would
    otherwise be silently dropped (e.g. the mesh path of ``inference.py``,
    which skips the host-side transform).
    """
    _check_streaming_compat(model)
    if "lora" in params:
        params = model.prepare_inference_params(params)
    cfg = model.cfg
    bcfg = model.backbone_cfg
    bs, init_len, n_patch = init_states.shape[:3]
    R = model.max_ctx_len  # ring capacity in frames
    if init_len > R:
        # the prefill writes context frames at unwrapped ring slots; a
        # context longer than the ring has no meaningful cache state anyway
        raise ValueError(
            f"streaming context ({init_len} frames) exceeds the ring "
            f"capacity max_ctx_len={R}; pass at most {R} context states"
        )
    n_sink = (1 if cfg.use_bos_token else 0) + (n_patch if cfg.see_init_state else 0)
    cache = bb.init_streaming_cache(bcfg, bs, n_sink, R, n_patch)

    # static per-dataset spatial ids; absolute time is appended per frame.
    # When the model was trained with ``absolute_time_ids`` the batch's t ids
    # carry the trajectory base step — honour it so serving matches training.
    spatial = position_ids[:, :1, :, :2]  # (bs, 1, n_patch, 2)
    t0 = position_ids[:, 0, 0, 2].astype(position_ids.dtype)  # (bs,)
    ival = cfg.seq_interval  # frames are seq_interval RAW trajectory steps apart

    def frame_pos_ids(t):
        # ``t`` is frame index relative to the window base (traced or static)
        tt = jnp.broadcast_to(
            (t0 + t * ival)[:, None, None, None], (bs, 1, n_patch, 1)
        ).astype(position_ids.dtype)
        return jnp.concatenate([spatial, tt], axis=-1)

    def embed_frame(state, t):
        return model.embed_frames(params, state[:, None], frame_pos_ids(t))

    def token_base(f):
        # absolute token position of frame f's first token
        return n_sink + f * n_patch

    # ---- prefill: sinks + all context frames except the last -------------
    prefill, prefill_pos = [], []
    if cfg.use_bos_token:
        bos = jnp.broadcast_to(
            params["bos"].astype(bcfg.dtype)[None, None, :], (bs, 1, bcfg.embed_dim)
        )
        prefill.append(bos)
        prefill_pos.append(jnp.arange(1))
    if cfg.see_init_state:
        # the TRUE initial condition, pinned at t=0 (the exact rollout
        # re-duplicates the first frame of the current window instead —
        # that token changes every step and cannot be cached)
        prefill.append(embed_frame(init_states[:, 0], 0))
        base = 1 if cfg.use_bos_token else 0
        prefill_pos.append(base + jnp.arange(n_patch))
    for f in range(init_len - 1):
        prefill.append(embed_frame(init_states[:, f], f))
        prefill_pos.append(token_base(f) + jnp.arange(n_patch))
    if prefill:
        x0 = jnp.concatenate(prefill, axis=1)
        p0 = jnp.concatenate(prefill_pos).astype(jnp.int32)
        _, cache = bb.apply_streaming(
            params["backbone"], bcfg, x0, p0, cache, 0, prefill=True,
            frame_tokens=n_patch,
        )

    # ---- decode steps: append one frame, read its diff --------------------
    def step(carry, i):
        state, cache = carry
        f = init_len - 1 + i  # frame index being appended
        emb = model.embed_frames(params, state[:, None], frame_pos_ids(f))
        positions = token_base(f) + jnp.arange(n_patch, dtype=jnp.int32)
        y, new_cache = bb.apply_streaming(
            params["backbone"], bcfg, emb, positions, cache, f % R
        )
        diff_img = model.decode_frame_tokens(params, y)
        diffs = img_to_patch(diff_img[:, None], model.ds_props)[:, 0]

        # boundary forcing with the last available mask (``model.py:202,206``)
        step_idx = jnp.minimum(f, bc_mask.shape[1] - 1)
        mask = jax.lax.dynamic_index_in_dim(bc_mask, step_idx, 1, False)
        diffs = jnp.where(mask, 0.0, diffs)

        next_state = state + diffs
        return (next_state, new_cache), (next_state, diffs)

    (_, _), (next_states, all_diffs) = jax.lax.scan(
        step, (init_states[:, -1], cache), jnp.arange(n_steps)
    )
    next_states = jnp.moveaxis(next_states, 0, 1)
    all_diffs = jnp.moveaxis(all_diffs, 0, 1)
    all_states = jnp.concatenate([init_states, next_states], axis=1)
    return all_states, all_diffs


def gen_seq_streaming(
    model: FluidLLM,
    params: Params,
    batch: tuple,
    pred_steps: int,
    start_state: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming counterpart of ``rollout.generate.gen_seq``."""
    states, _, _, bc_mask, position_ids = batch
    if pred_steps + start_state - 1 > states.shape[1]:
        raise ValueError(
            f"Prediction steps ({pred_steps}) + start state ({start_state}) "
            f"must be less than total sequence length {states.shape[1]}!"
        )
    all_states, all_diffs = generate_streaming(
        model, params, states[:, :start_state], bc_mask, position_ids, pred_steps
    )
    return patch_to_img(all_states, model.ds_props), patch_to_img(all_diffs, model.ds_props)
