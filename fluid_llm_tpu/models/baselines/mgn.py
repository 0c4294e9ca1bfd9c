"""MeshGraphNet baseline (EAGLE benchmark comparison model).

Functional equivalent of ``eagle/Models/MeshGraphNet.py:13-156``: encode
(node one-hot + state, edge dist + norm, running-stat Normalizers) -> N=15
residual message-passing blocks -> MLP decoder of normalized diffs ->
autoregressive rollout with boundary-condition forcing
(``next_state[mask] = state[:, t][mask]``).

TPU-first: the time loop is a ``lax.scan`` (normalizer states threaded
through the carry), message passing is XLA ``segment_sum`` over ghost-padded
static-shape edge lists.

Reference quirk, knowingly fixed: the input-noise mask collapses to a
per-batch bool (``MeshGraphNet.py:27-30`` indexes ``mask[:, 0]``), so noise
was all-or-nothing per sample; here it is applied per NORMAL/OUTPUT node as
intended (the GraphViT file carries the intended form, ``GraphViT.py:28-31``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.baselines.base import (
    NODE_DISABLE,
    NODE_INPUT,
    NODE_NORMAL,
    NODE_OUTPUT,
    NODE_WALL,
    gnn_apply,
    gnn_init,
    mlp_apply,
    mlp_init,
    normalizer_apply,
    normalizer_init,
    normalizer_inverse,
)
from fluid_llm_tpu.ops.segment_ops import gather_nodes

Params = dict[str, Any]


def edge_features(mesh_pos, edges, rev_window: int = 0):
    """[sender-receiver distance, norm] (``MeshGraphNet.py:70-76``)."""
    senders = gather_nodes(mesh_pos, edges[..., 0], windowed=True)
    receivers = gather_nodes(mesh_pos, edges[..., 1],
                             windowed=(rev_window > 0), window=rev_window or 512)
    distance = senders - receivers
    norm = jnp.sqrt(jnp.sum(distance**2, axis=-1, keepdims=True))
    return jnp.concatenate([distance, norm], axis=-1)


def bc_mask_from_types(node_type):
    """INPUT | WALL | DISABLE forcing mask (``MeshGraphNet.py:45-47``)."""
    return (
        (node_type[..., NODE_INPUT] == 1)
        | (node_type[..., NODE_WALL] == 1)
        | (node_type[..., NODE_DISABLE] == 1)
    )


def noise_mask_from_types(node_type):
    return (node_type[..., NODE_NORMAL] == 1) | (node_type[..., NODE_OUTPUT] == 1)


def mgn_init(key, state_size: int = 4, n_processor: int = 15) -> tuple[Params, Params]:
    """Returns (params, normalizer state tree)."""
    keys = jax.random.split(key, n_processor + 3)
    params: Params = {
        "fv": mlp_init(keys[0], 9 + state_size),
        "fe": mlp_init(keys[1], 3),
        "processor": [gnn_init(k) for k in keys[2:2 + n_processor]],
        "decoder": mlp_init(keys[-1], 128, state_size, layer_norm=False),
    }
    norm = {
        "nodes": normalizer_init(9 + state_size),
        "edges": normalizer_init(3),
        "output": normalizer_init(state_size),
    }
    return params, norm


def mgn_apply(
    params: Params,
    norm: Params,
    mesh_pos: jnp.ndarray,
    edges: jnp.ndarray,
    state: jnp.ndarray,
    node_type: jnp.ndarray,
    *,
    train: bool = False,
    apply_noise: bool = False,
    noise_std: float = 2e-2,
    rng: Optional[jax.Array] = None,
    rev_window: int = 0,
):
    """Window rollout (``MeshGraphNet.py:31-56``).

    mesh_pos: (B, T, N, 2); edges: (B, T, E, 2) int; state: (B, T, N, S);
    node_type: (B, T, N, 9) one-hot.  ``rev_window`` (static): see
    ``base.gnn_apply`` — engages the Pallas kernels for the
    ``edges[..., 1]`` gathers/backward-scatters.  Returns
    (state_hat (B, T, N, S), output_hat (B, T-1, N, S), target, new norm).
    """
    B, T, N, S = state.shape

    if apply_noise and rng is not None:
        nm = noise_mask_from_types(node_type[:, 0])  # (B, N)
        noise = jax.random.normal(rng, state[:, 0].shape) * noise_std
        state = state.at[:, 0].set(
            jnp.where(nm[..., None], state[:, 0] + noise, state[:, 0])
        )

    target_raw = state[:, 1:] - state[:, :-1]
    target, norm_out = normalizer_apply(norm["output"], target_raw, update=train)

    def step(carry, xs):
        prev_state, n_nodes, n_edges = carry
        mesh_t, edges_t, nt_prev, nt_t, state_t = xs

        v_in = jnp.concatenate([prev_state, nt_prev.astype(prev_state.dtype)], axis=-1)
        v_in, n_nodes = normalizer_apply(n_nodes, v_in, update=train)
        e_in = edge_features(mesh_t, edges_t, rev_window)
        e_in, n_edges = normalizer_apply(n_edges, e_in, update=train)

        V = mlp_apply(params["fv"], v_in)
        E = mlp_apply(params["fe"], e_in)
        for gp in params["processor"]:
            v, e = gnn_apply(gp, V, E, edges_t, rev_window)
            V = V + v
            E = E + e

        next_output = mlp_apply(params["decoder"], V)
        denorm = normalizer_inverse(norm_out, next_output)
        next_state = prev_state + denorm

        mask = bc_mask_from_types(nt_t)
        next_state = jnp.where(mask[..., None], state_t, next_state)
        return (next_state, n_nodes, n_edges), (next_state, next_output)

    xs = (
        jnp.moveaxis(mesh_pos[:, :-1], 1, 0),
        jnp.moveaxis(edges[:, :-1], 1, 0),
        jnp.moveaxis(node_type[:, :-1], 1, 0),
        jnp.moveaxis(node_type[:, 1:], 1, 0),
        jnp.moveaxis(state[:, 1:], 1, 0),
    )
    (last, n_nodes, n_edges), (states_hat, outputs_hat) = jax.lax.scan(
        step, (state[:, 0], norm["nodes"], norm["edges"]), xs
    )
    state_hat = jnp.concatenate(
        [state[:, :1], jnp.moveaxis(states_hat, 0, 1)], axis=1
    )
    output_hat = jnp.moveaxis(outputs_hat, 0, 1)
    new_norm = {"nodes": n_nodes, "edges": n_edges, "output": norm_out}
    return state_hat, output_hat, target, new_norm


def mgn_loss(output_hat, target, mask, w_pressure: float = 0.1):
    """``eagle/train_mgn.py:64-72``: masked MSE on normalized diffs with
    pressure weighting.  ``mask``: (B, T, N) real-node mask; the reference
    zeroes ghosts then takes a plain mean over everything."""
    m = mask[:, 1:, :, None].astype(output_hat.dtype)
    loss_v = jnp.mean((target[..., :2] * m - output_hat[..., :2] * m) ** 2)
    loss_p = jnp.mean((target[..., 2:] * m - output_hat[..., 2:] * m) ** 2)
    return loss_v + w_pressure * loss_p
