"""Patch decoders: LLM hidden states -> per-pixel (Vx, Vy, P) diffs.

Equivalents of ``src/models/layers/patch_decoder.py`` and
``src/models/layers/GNN/decoders.py``.  Three supported types:

- ``MLP``:     per-token MLP to patch_in_dim, reinterpreted as the image
               (``patch_decoder.py:15-21`` + the raw view in
               ``model.py:151``).
- ``CNN``:     Conv1d stack over the *token* axis (``patch_decoder.py:22-30``
               with ``CNN.py:4``, ``conv_type='1d'``, ``pool_output=False``).
               Reference quirks, reproduced exactly: the (bs, T, d) token
               stream is *raw-reshaped* (not transposed) to (bs, d, T)
               before the conv and raw-reshaped back after
               (``patch_decoder.py:46-52``), so each conv "channel" is a
               strided view mixing tokens — and the reshape back silently
               requires ``out_dim == llm_dim`` (checked at init here).
               Because the conv's receptive field spans the whole window's
               token stream, frames are NOT decoded independently: the
               rollout paths fall back to full-window decode for this type
               (see ``fluid_llm.predict_frame_diff``).
- ``MLPGNN``:  the reference default (``configs/training1.yaml:55``): MLP
               projects each token to out_patch x gnn_dim pixel features,
               ``F.fold`` scatters them onto the pixel grid, and a GATv2
               stack over the 4-neighbour grid graph refines to 3 channels
               (``GNN/decoders.py:196-248``) — here the fold is a reshape and
               the GNN is the dense scatter-free grid attention in
               ``ops/grid_gnn.py``.

The reference's ``MLP0`` and ``GNN`` decoder variants are dead/broken
(hardcoded N_patch=60 at ``decoders.py:52``; undefined attrs at ``:102,115``)
and intentionally omitted (SURVEY.md §7 quirks list).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.config import DecoderConfig
from fluid_llm_tpu.data.ds_props import DSProps
from fluid_llm_tpu.models.common import cnn1d_apply, cnn1d_init, mlp_apply, mlp_init
from fluid_llm_tpu.ops.grid_gnn import grid_gat_stack_apply, grid_gat_stack_init
from fluid_llm_tpu.ops.patching import fold_features

Params = dict[str, Any]


def patch_decoder_init(key, llm_dim: int, ds_props: DSProps, cfg: DecoderConfig) -> Params:
    if cfg.type == "MLP":
        return {
            "mlp": mlp_init(
                key, llm_dim, ds_props.patch_in_dim, cfg.hidden_dim, cfg.num_layers,
                zero_last=cfg.zero_last_layer,
            )
        }
    if cfg.type == "CNN":
        if ds_props.patch_in_dim != llm_dim:
            # the reference's post-conv raw reshape back to (bs, T, llm_dim)
            # (``patch_decoder.py:52``) only round-trips when the decoder
            # output dim equals the LLM dim; any other combination crashes
            # upstream with an opaque view error — reject it clearly here
            raise ValueError(
                "decoder type CNN requires patch_in_dim == llm_dim "
                f"(got {ds_props.patch_in_dim} != {llm_dim}): the reference's "
                "raw reshape back to the token stream (patch_decoder.py:52) "
                "is only shape-consistent in that case"
            )
        return {
            "cnn": cnn1d_init(
                key, llm_dim, ds_props.patch_in_dim, cfg.hidden_dim,
                cfg.num_layers, zero_last=cfg.zero_last_layer,
            )
        }
    if cfg.type == "MLPGNN":
        k1, k2 = jax.random.split(key)
        opx, opy = ds_props.out_patch_size
        mlp_out_dim = opx * opy * cfg.gnn_dim
        return {
            # 2-layer softplus MLP (``decoders.py:208``)
            "mlp": mlp_init(k1, llm_dim, mlp_out_dim, cfg.mlp_hid_dim, 2),
            "gnn": grid_gat_stack_init(
                k2, cfg.gnn_dim, cfg.gnn_hid_dim, 3, cfg.gnn_layers, cfg.gnn_heads
            ),
        }
    raise ValueError(f"Unknown patch decoder type: {cfg.type}")


def patch_decoder_apply(
    params: Params,
    tokens: jnp.ndarray,
    ds_props: DSProps,
    cfg: DecoderConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """tokens: (bs, seq, N_patch, llm_dim) -> image (bs, seq, X, Y, 3)."""
    bs, seq, n, d = tokens.shape
    X, Y = ds_props.out_tot_size
    if cfg.type == "MLP":
        out = mlp_apply(params["mlp"], tokens, cfg.activation)
        # Reference quirk, reproduced: the flat (N_patch * patch_in_dim)
        # vector is *raw-reinterpreted* as (X, Y, 3) (``model.py:151``), so
        # each patch's output actually covers a horizontal slab, not its
        # 16x16 block.  The layout is learned, so training is unaffected.
        return out.reshape(bs, seq, X, Y, 3)
    if cfg.type == "CNN":
        # ``patch_decoder.py:44-52``: RAW reshape (bs, T, d) -> (bs, d, T)
        # (a reinterpret, NOT a transpose — jnp.reshape is row-major like
        # torch's on contiguous tensors), Conv1d stack over the length axis,
        # raw reshape back.  The swapaxes pairs below only bridge to the
        # NWC conv layout; the semantic scramble is the two reshapes.
        flat = tokens.reshape(bs, seq * n, d)
        x = flat.reshape(bs, d, seq * n)
        x = jnp.swapaxes(x, 1, 2)  # (bs, T, d) channels-last for the conv
        x = cnn1d_apply(params["cnn"], x, cfg.activation)
        x = jnp.swapaxes(x, 1, 2)  # back to (bs, out_dim, T)
        out = x.reshape(bs, seq * n, d)
        # the caller-side raw view to the image (``model.py:151``)
        return out.reshape(bs, seq, X, Y, 3)
    # MLPGNN
    h = mlp_apply(params["mlp"], tokens, "softplus")  # (bs, seq, N_patch, opx*opy*gnn)
    grid = fold_features(h, ds_props, cfg.gnn_dim)  # (bs, seq, X, Y, gnn_dim)
    preds = grid_gat_stack_apply(
        params["gnn"], grid, cfg.gnn_hid_dim, 3, cfg.gnn_heads,
        dropout=cfg.dropout if train else 0.0, rng=rng,
        # channels-first fused fwd+bwd kernels are DEFAULT-ON for training
        # too (FLUID_GNN_FUSED_BWD=0 opts out — same gate as
        # ops/grid_gnn_pallas.py); dispatch still requires >=16 frames and
        # a TPU backend (``grid_gnn_pallas.supported``)
        allow_fused=(not train) or os.environ.get("FLUID_GNN_FUSED_BWD", "1") != "0",
    )
    return preds
