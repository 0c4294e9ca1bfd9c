"""Shared baseline blocks: MLP, message-passing GNN, GAT, running Normalizer.

Functional equivalents of ``eagle/Models/Base.py``:

- ``MLP``: Linear/ReLU stack with optional final LayerNorm (``Base.py:6-24``).
- ``GNN``: edge MLP over [sender, receiver, edge] -> scatter-sum back to the
  *sender* index -> node MLP over [node, edge_sum] (``Base.py:27-49``; the
  reference aggregates at ``edges[..., 0]`` — with bidirectional edge lists
  this equals receiver aggregation, reproduced as-is).
- ``GAT``/``multiHeadGAT``: softmax-free attention normalised by
  scatter-summed exp weights (``Base.py:52-86``).
- ``Normalizer``: running-stat accumulator (``Base.py:89-118``), made an
  explicit functional state (SURVEY.md §7 hard-part #4).  The reference's
  arithmetic is reproduced exactly, including its quirk of accumulating
  per-call *means* while counting per-call *batch sizes* (so ``mean`` is the
  sum of batch-means over the total sample count, not a true running mean) —
  downstream MLPs are trained on exactly these statistics.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.ops.segment_ops import gather_nodes, segment_sum_nodes

Params = dict[str, Any]

# node-type codes (``eagle/Models/MeshGraphNet.py:7-11``)
NODE_NORMAL = 0
NODE_INPUT = 4
NODE_OUTPUT = 5
NODE_WALL = 6
NODE_DISABLE = 2


def _torch_linear_init(key, d_in, d_out):
    wk, bk = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(wk, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (d_out,), jnp.float32, -bound, bound),
    }


def mlp_init(key, input_size, output_size=128, layer_norm=True, n_hidden=2, hidden_size=128):
    """``Base.py:6-21``: input->hidden, (n_hidden-1) hiddens, ->output [+LN]."""
    if hidden_size == 0:
        return {"layers": [_torch_linear_init(key, input_size, output_size)], "ln": None}
    keys = jax.random.split(key, n_hidden + 1)
    layers = [_torch_linear_init(keys[0], input_size, hidden_size)]
    for i in range(1, n_hidden):
        layers.append(_torch_linear_init(keys[i], hidden_size, hidden_size))
    layers.append(_torch_linear_init(keys[-1], hidden_size, output_size))
    ln = {"scale": jnp.ones((output_size,)), "bias": jnp.zeros((output_size,))} if layer_norm else None
    return {"layers": layers, "ln": ln}


def mlp_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # compute follows the param dtype (bf16 compute / f32 masters under
    # baselines_cli --dtype bf16; a no-op in the default f32 mode)
    x = x.astype(p["layers"][0]["w"].dtype)
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = x @ lp["w"] + lp["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    if p["ln"] is not None:
        x32 = x.astype(jnp.float32)  # stable LN stats under bf16 compute
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        x = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) \
            * p["ln"]["scale"] + p["ln"]["bias"]
    return x


# -- message-passing GNN block ----------------------------------------------


def gnn_init(key, n_hidden=2, node_size=128, edge_size=128, output_size=None, layer_norm=False):
    output_size = output_size or node_size
    k1, k2 = jax.random.split(key)
    return {
        "f_edge": mlp_init(k1, edge_size + node_size * 2, edge_size,
                           layer_norm=layer_norm, n_hidden=n_hidden),
        "f_node": mlp_init(k2, edge_size + node_size, output_size,
                           layer_norm=layer_norm, n_hidden=n_hidden),
    }


def gnn_apply(p: Params, V, E, edges, rev_window: int = 0):
    """``Base.py:36-49``.  V: (B, N, Fv); E: (B, Ne, Fe); edges: (B, Ne, 2).

    ``rev_window`` (static): >0 promises ``edges[..., 1]`` is window-local
    at that band width (collate-verified RCM/grid node order,
    ``data/reorder.py``) so the reverse gather + its backward scatter ride
    the Pallas MXU kernels too; 0 keeps them on XLA."""
    # edges[..., 0] is dataloader-sorted (faces_to_edges) -> static
    # windowed=True engages the Pallas MXU kernels
    senders = gather_nodes(V, edges[..., 0], windowed=True)
    receivers = gather_nodes(V, edges[..., 1],
                             windowed=(rev_window > 0), window=rev_window or 512)
    edge_emb = mlp_apply(p["f_edge"], jnp.concatenate([senders, receivers, E], axis=-1))
    edge_sum = segment_sum_nodes(edge_emb, edges[..., 0], V.shape[-2], windowed=True)
    node_emb = mlp_apply(p["f_node"], jnp.concatenate([V, edge_sum], axis=-1))
    return node_emb, edge_emb


# -- GAT ---------------------------------------------------------------------


def gat_init(key, node_size, output_size):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(node_size)
    f_edge = {"w": jax.random.uniform(k1, (node_size, output_size), jnp.float32, -bound, bound)}
    att = _torch_linear_init(k2, output_size * 2 + 128, 1)
    return {"f_edge": f_edge, "att": att}


def gat_apply(p: Params, V, E, edges, rev_window: int = 0):
    """``Base.py:64-86``: exp-weighted scatter attention at the sender index."""
    senders = gather_nodes(V, edges[..., 0], windowed=True)
    receivers = gather_nodes(V, edges[..., 1],
                             windowed=(rev_window > 0), window=rev_window or 512)
    h_sender = senders @ p["f_edge"]["w"]
    h_receiver = receivers @ p["f_edge"]["w"]

    att_in = jnp.concatenate([h_sender, h_receiver, E], axis=-1)
    attention = jax.nn.leaky_relu(att_in @ p["att"]["w"] + p["att"]["b"], 0.2)
    attention = jnp.exp(attention - jnp.max(attention, axis=1, keepdims=True))

    n = V.shape[-2]
    numerator = segment_sum_nodes(attention * h_sender, edges[..., 0], n, windowed=True)
    denominator = segment_sum_nodes(attention, edges[..., 0], n, windowed=True)
    return numerator / (denominator + 1e-8)


def multihead_gat_init(key, node_size, output_size, n_heads):
    assert output_size % n_heads == 0
    keys = jax.random.split(key, n_heads)
    return {"heads": [gat_init(k, node_size, output_size // n_heads) for k in keys]}


def multihead_gat_apply(p: Params, V, E, edges, rev_window: int = 0):
    return jnp.concatenate(
        [gat_apply(h, V, E, edges, rev_window) for h in p["heads"]], axis=-1)


# -- running-stat Normalizer -------------------------------------------------


def normalizer_init(size: int, init_std: float = 1.0) -> Params:
    """``init_std=1`` matches the MeshGraphNet-file variant
    (``MeshGraphNet.py:118-125``); ``Base.py:89-98`` inits std to 0."""
    return {
        "acc": jnp.zeros((size,)),
        "acc_sq": jnp.zeros((size,)),
        "count": jnp.zeros((), jnp.float32),
        "mean": jnp.zeros((size,)),
        "std": jnp.full((size,), init_std),
    }


def normalizer_apply(state: Params, x: jnp.ndarray, update: bool) -> tuple[jnp.ndarray, Params]:
    """``Base.py:102-115``: accumulate batch means, refresh stored mean/std
    only while updating.  ``update`` corresponds to torch ``.training``."""
    flat = x.reshape(-1, x.shape[-2], x.shape[-1])
    if update:
        below_cap = state["count"] < 1e7
        inc = jnp.where(below_cap, jnp.float32(flat.shape[0]), 0.0)
        add = jnp.where(below_cap, 1.0, 0.0)
        acc = state["acc"] + add * jnp.mean(flat, axis=(0, 1))
        acc_sq = state["acc_sq"] + add * jnp.mean(flat**2, axis=(0, 1))
        count = state["count"] + inc
        mean = acc / (count + 1e-8)
        std = jnp.sqrt(acc_sq / (count + 1e-8) - mean**2)
        mean = jnp.where(below_cap, mean, state["mean"])
        std = jnp.where(below_cap, std, state["std"])
        state = {"acc": acc, "acc_sq": acc_sq, "count": count, "mean": mean, "std": std}
    return (x - state["mean"]) / (state["std"] + 1e-8), state


def normalizer_inverse(state: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x * state["std"] + state["mean"]
