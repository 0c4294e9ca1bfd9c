"""GATNet: vertex/edge MLP embedders + edge-featured GAT attention layers.

Functional equivalent of ``src/models/layers/GNN/GATConv.py:7-49`` (the
encoder network whose only upstream consumer is the dead ``GNN_encoder``
variant — provided for API-surface completeness).  Attention follows
torch-geometric's ``GATConv`` with ``edge_dim`` set: per-edge logits from
``att_src.x_src + att_dst.x_dst + att_edge.e`` with LeakyReLU and a scatter
softmax over each target's incoming edges; softplus between layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.baselines.base import mlp_apply, mlp_init
from fluid_llm_tpu.ops.segment_ops import segment_sum_nodes

Params = dict[str, Any]


@dataclass(frozen=True)
class GATNetConfig:
    mlp_layers: int = 2
    mlp_hid_dim: int = 64
    gnn_layers: int = 3
    gnn_dim: int = 32
    gnn_heads: int = 2


def _glorot(key, shape):
    s = jnp.sqrt(6.0 / (shape[0] + shape[-1]))
    return jax.random.uniform(key, shape, jnp.float32, -s, s)


def gat_edge_conv_init(key, in_dim, out_dim, heads, edge_dim):
    k = jax.random.split(key, 5)
    return {
        "lin": _glorot(k[0], (in_dim, heads * out_dim)),
        "lin_edge": _glorot(k[1], (edge_dim, heads * out_dim)),
        "att_src": _glorot(k[2], (heads, out_dim)),
        "att_dst": _glorot(k[3], (heads, out_dim)),
        "att_edge": _glorot(k[4], (heads, out_dim)),
        "bias": jnp.zeros((heads * out_dim,)),
    }


def gat_edge_conv_apply(p: Params, V, E, edges, heads: int, out_dim: int):
    """V: (B, N, F); E: (B, Ne, Fe); edges: (B, Ne, 2) [src, dst]."""
    B, N, _ = V.shape
    x = (V @ p["lin"]).reshape(B, N, heads, out_dim)
    e = (E @ p["lin_edge"]).reshape(B, E.shape[1], heads, out_dim)

    src = jnp.take_along_axis(x, edges[..., 0, None, None], axis=1)
    dst = jnp.take_along_axis(x, edges[..., 1, None, None], axis=1)

    alpha = (
        (src * p["att_src"]).sum(-1)
        + (dst * p["att_dst"]).sum(-1)
        + (e * p["att_edge"]).sum(-1)
    )  # (B, Ne, H)
    alpha = jax.nn.leaky_relu(alpha, 0.2)

    # scatter softmax over incoming edges per destination node (global-max
    # shift for stability)
    dst_idx = edges[..., 1]
    alpha = jnp.exp(alpha - jax.lax.stop_gradient(alpha.max(axis=1, keepdims=True)))
    # dst = edges[..., 1]: NOT the dataloader-sorted column -> XLA path
    denom = segment_sum_nodes(alpha, dst_idx, N, windowed=False)  # (B, N, H)
    num = segment_sum_nodes(alpha[..., None] * src, dst_idx, N, windowed=False)  # (B, N, H, C)
    out = num / (denom[..., None] + 1e-16)
    return out.reshape(B, N, heads * out_dim) + p["bias"]


def gatnet_init(key, vertex_dim: int, edge_dim: int, out_dim: int,
                cfg: GATNetConfig = GATNetConfig()) -> Params:
    """``GATConv.py:14-36``: first layer gnn_dim->gnn_dim x heads, hidden
    layers from the concatenated width, output layer single-head."""
    n_gnn = cfg.gnn_layers
    keys = jax.random.split(key, n_gnn + 2)
    layers = [gat_edge_conv_init(keys[0], cfg.gnn_dim, cfg.gnn_dim, cfg.gnn_heads, cfg.gnn_dim)]
    for i in range(n_gnn - 2):
        layers.append(
            gat_edge_conv_init(keys[1 + i], cfg.gnn_dim * cfg.gnn_heads, cfg.gnn_dim,
                               cfg.gnn_heads, cfg.gnn_dim)
        )
    layers.append(
        gat_edge_conv_init(keys[n_gnn - 1], cfg.gnn_dim * cfg.gnn_heads, out_dim, 1, cfg.gnn_dim)
    )
    return {
        "vertx_mlp": mlp_init(keys[-2], vertex_dim, cfg.gnn_dim, layer_norm=False,
                              n_hidden=cfg.mlp_layers, hidden_size=cfg.mlp_hid_dim),
        "edge_mlp": mlp_init(keys[-1], edge_dim, cfg.gnn_dim, layer_norm=False,
                             n_hidden=cfg.mlp_layers, hidden_size=cfg.mlp_hid_dim),
        "layers": layers,
    }


def gatnet_apply(params: Params, vert_in, edge_in, edges, out_dim: int,
                 cfg: GATNetConfig = GATNetConfig()) -> jnp.ndarray:
    """``GATConv.py:38-49``: embed, N GAT layers with softplus between."""
    V = mlp_apply(params["vertx_mlp"], vert_in)
    E = mlp_apply(params["edge_mlp"], edge_in)
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        h = 1 if i == n - 1 else cfg.gnn_heads
        od = out_dim if i == n - 1 else cfg.gnn_dim
        V = gat_edge_conv_apply(layer, V, E, edges, h, od)
        if i < n - 1:
            V = jax.nn.softplus(V)
    return V
