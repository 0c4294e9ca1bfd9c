"""Input embedding stack: patch encoder + spatiotemporal positional encodings.

Equivalents of ``src/models/layers/input_embeddings.py``,
``patch_encoder.py``, ``positional_encodings/positional_embeddings.py`` and
``positional_encodings/rotary_3d_positional_embeddings.py``.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.config import EncoderConfig, PosEmbeddingConfig
from fluid_llm_tpu.models.common import cnn_apply, cnn_init, mlp_apply, mlp_init

Params = dict[str, Any]


# -- patch encoder (``patch_encoder.py:6-30``) ------------------------------


def patch_encoder_init(key, patch_in_dim: int, llm_dim: int, cfg: EncoderConfig) -> Params:
    if cfg.type == "MLP":
        return {"mlp": mlp_init(key, patch_in_dim, llm_dim, cfg.hidden_dim, cfg.num_layers)}
    if cfg.type == "CNN":
        return {"cnn": cnn_init(key, 3, llm_dim, cfg.hidden_dim, cfg.num_layers)}
    raise ValueError(f"Unknown patch embedding type: {cfg.type}")


def patch_encoder_apply(params: Params, x: jnp.ndarray, cfg: EncoderConfig) -> jnp.ndarray:
    """x: (bs, seq, N_patch, C, px, py) -> (bs, seq, N_patch, llm_dim)."""
    bs, seq, n, c, px, py = x.shape
    if cfg.type == "MLP":
        flat = x.reshape(bs, seq, n, c * px * py)
        return mlp_apply(params["mlp"], flat, cfg.activation)
    # CNN path: conv over each patch then average-pool (``patch_encoder.py:17-19``)
    imgs = x.reshape(bs * seq * n, c, px, py).transpose(0, 2, 3, 1)
    out = cnn_apply(params["cnn"], imgs, cfg.activation, pool_output=True)
    return out.reshape(bs, seq, n, -1)


# -- learned 3-axis positional embeddings (``positional_embeddings.py:6-37``) --


def pos_embed_init(key, llm_dim: int, max_embeds: tuple[int, int, int], init_mode: str) -> Params:
    max_x, max_y, max_t = max_embeds
    kx, ky, kt = jax.random.split(key, 3)
    if init_mode == "zero":
        mk = lambda k, n: jnp.zeros((n, llm_dim), jnp.float32)
    elif init_mode == "scaled":
        std = 1.0 / math.sqrt(llm_dim)
        mk = lambda k, n: jax.random.normal(k, (n, llm_dim), jnp.float32) * std
    else:  # "normal": torch nn.Embedding default N(0, 1)
        mk = lambda k, n: jax.random.normal(k, (n, llm_dim), jnp.float32)
    return {"x": mk(kx, max_x), "y": mk(ky, max_y), "t": mk(kt, max_t)}


def pos_embed_apply(params: Params, x: jnp.ndarray, position_ids: jnp.ndarray) -> jnp.ndarray:
    """x: (..., llm_dim); position_ids: (..., 3) int -> x + ex + ey + et."""
    ex = params["x"][position_ids[..., 0]]
    ey = params["y"][position_ids[..., 1]]
    et = params["t"][position_ids[..., 2]]
    return x + (ex + ey + et).astype(x.dtype)


# -- additive 3-axis sin/cos "rotary" embedding -----------------------------


def _sincos_ladder3(x: jnp.ndarray, pos_scaled: jnp.ndarray) -> jnp.ndarray:
    """Add the reference's 3-axis sinusoid ladder to ``x``.

    pos_scaled: (bs, L, 3) pre-scaled positions (callers differ ONLY in the
    scaling).  Per axis i the reference writes sin/cos blockwise-interleaved
    into the i-th third of the feature dim, truncated to ``d // 3``
    (``rotary_3d_positional_embeddings.py:29-48``).
    """
    bs, seq, n, d = x.shape
    L = seq * n
    third = d // 3
    dim_t = jnp.power(10000.0, 2.0 * jnp.arange(third, dtype=jnp.float32) / d)

    pe = jnp.zeros((bs, L, d), jnp.float32)
    for i in range(3):
        pos_i = pos_scaled[:, :, i][:, :, None] / dim_t  # (bs, L, third)
        # stack (sin, cos) on a new axis-2 then flatten: interleaves blockwise
        pe_i = jnp.stack([jnp.sin(pos_i), jnp.cos(pos_i)], axis=2).reshape(bs, L, -1)
        pe = pe.at[:, :, i * third:(i + 1) * third].set(pe_i[:, :, :third])
    return x + pe.reshape(bs, seq, n, d).astype(x.dtype)


def rotary3d_apply(x: jnp.ndarray, position_ids: jnp.ndarray, hidden_dim: int) -> jnp.ndarray:
    """``rotary_3d_positional_embeddings.py:6-61`` as pure recomputation.

    The reference caches per unique-position key (a python dict, incompatible
    with jit); recomputation is cheap and XLA hoists it when positions are
    constant.  x: (bs, seq, N_patch, d); position_ids: (bs, seq, N_patch, 3).
    """
    bs, seq, n, d = x.shape
    pos = position_ids.reshape(bs, seq * n, 3).astype(jnp.float32)
    max_vals = jnp.max(pos, axis=1, keepdims=True)
    safe_max = jnp.where(max_vals > 0, max_vals, 1.0)
    return _sincos_ladder3(x, pos / safe_max * (2 * math.pi))


def rotary3d_abs_apply(
    x: jnp.ndarray, position_ids: jnp.ndarray, spatial_scale: tuple[int, int]
) -> jnp.ndarray:
    """Cache-stable variant of ``rotary3d_apply`` for streaming serving.

    ``rotary3d_apply`` normalises every axis by the *batch max* — the time
    axis's encoding therefore changes as the rollout window slides, which
    invalidates any KV cache.  Here the spatial axes are normalised by the
    STATIC patch-grid extent (``spatial_scale``) and time is consumed raw
    through the standard sinusoidal wavelength ladder (unbounded angles are
    well-defined; the ladder resolves both short and long lags), so a
    token's embedding is a pure function of its absolute (x, y, t) — frozen
    once computed.  Opt-in (``pos_embedding_type: rope_abs``); not a
    reference mode.  x: (bs, seq, N_patch, d); position_ids: (..., 3).

    The 2π factor applies to the NORMALISED spatial axes only.  Feeding raw
    integer t through it would zero the i=0 rung (sin 2πt = 0, cos 2πt = 1)
    and alias the low rungs at ~1 period/step; raw t into the ladder is the
    standard absolute sinusoidal encoding.  (Changed r3 after advisor review
    — checkpoints trained with the r2 scaling are not embedding-compatible.)
    """
    bs, seq, n, d = x.shape
    pos = position_ids.reshape(bs, seq * n, 3).astype(jnp.float32)
    sx, sy = spatial_scale
    mult = jnp.asarray(
        [2 * math.pi / max(sx - 1, 1), 2 * math.pi / max(sy - 1, 1), 1.0],
        jnp.float32,
    )
    return _sincos_ladder3(x, pos * mult)


# -- combined input embeddings (``input_embeddings.py:9-52``) ----------------


def input_embeddings_init(
    key,
    patch_in_dim: int,
    llm_dim: int,
    max_embeds: tuple[int, int, int],
    enc_cfg: EncoderConfig,
    emb_cfg: PosEmbeddingConfig,
) -> Params:
    k1, k2 = jax.random.split(key)
    params: Params = {"patch": patch_encoder_init(k1, patch_in_dim, llm_dim, enc_cfg)}
    if emb_cfg.pos_embedding_type == "pos":
        params["pos"] = pos_embed_init(k2, llm_dim, max_embeds, emb_cfg.init_pos_embed)
    if emb_cfg.in_emb_ln_eps is not None:
        params["ln"] = {"scale": jnp.ones((llm_dim,)), "bias": jnp.zeros((llm_dim,))}
    return params


def input_embeddings_apply(
    params: Params,
    x: jnp.ndarray,
    position_ids: jnp.ndarray,
    enc_cfg: EncoderConfig,
    emb_cfg: PosEmbeddingConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    spatial_scale: Optional[tuple[int, int]] = None,
) -> jnp.ndarray:
    """(bs, seq, N_patch, C, px, py) -> (bs, seq, N_patch, llm_dim)."""
    h = patch_encoder_apply(params["patch"], x, enc_cfg)
    if emb_cfg.pos_embedding_type == "pos":
        h = pos_embed_apply(params["pos"], h, position_ids)
    elif emb_cfg.pos_embedding_type == "rope_abs":
        if spatial_scale is None:
            raise ValueError("rope_abs needs the static spatial_scale (Nx, Ny)")
        h = rotary3d_abs_apply(h, position_ids, spatial_scale)
    else:
        h = rotary3d_apply(h, position_ids, h.shape[-1])
    if "ln" in params:
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + emb_cfg.in_emb_ln_eps)
        h = h * params["ln"]["scale"] + params["ln"]["bias"]
    if train and emb_cfg.input_emb_layer_dropout:
        if rng is None:
            raise ValueError("input embedding dropout requires an rng")
        keep = jax.random.bernoulli(rng, 1.0 - emb_cfg.input_emb_layer_dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - emb_cfg.input_emb_layer_dropout), 0.0)
    return h
