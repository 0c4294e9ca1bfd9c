"""GAT baseline: MGN scaffold with chained multi-head GAT layers.

Functional equivalent of ``eagle/Models/GraphAttention.py:13-110``: same
encoder/decoder/normalizers as MeshGraphNet, but the processor is N=8
residual ``multiHeadGAT`` layers (softmax-free scatter attention,
``eagle/Models/Base.py:52-86``) and edges are not updated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.baselines.base import (
    mlp_apply,
    mlp_init,
    multihead_gat_apply,
    multihead_gat_init,
    normalizer_apply,
    normalizer_init,
    normalizer_inverse,
)
from fluid_llm_tpu.models.baselines.mgn import (
    bc_mask_from_types,
    edge_features,
    noise_mask_from_types,
)

Params = dict[str, Any]


def gat_init(key, state_size: int = 4, n_processor: int = 8, n_heads: int = 4):
    keys = jax.random.split(key, n_processor + 3)
    params: Params = {
        "fv": mlp_init(keys[0], 9 + state_size),
        "fe": mlp_init(keys[1], 3),
        "processor": [
            multihead_gat_init(k, 128, 128, n_heads) for k in keys[2:2 + n_processor]
        ],
        "decoder": mlp_init(keys[-1], 128, state_size, layer_norm=False),
    }
    norm = {
        "nodes": normalizer_init(9 + state_size),
        "edges": normalizer_init(3),
        "output": normalizer_init(state_size),
    }
    return params, norm


def gat_apply(
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
    """``GraphAttention.py:29-66`` as a scan; same I/O contract as mgn_apply."""
    B, T, N, S = state.shape

    if apply_noise and rng is not None:
        nm = noise_mask_from_types(node_type[:, 0])
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
            V = V + multihead_gat_apply(gp, V, E, edges_t, rev_window)

        next_output = mlp_apply(params["decoder"], V)
        next_state = prev_state + normalizer_inverse(norm_out, next_output)
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
    (_, n_nodes, n_edges), (states_hat, outputs_hat) = jax.lax.scan(
        step, (state[:, 0], norm["nodes"], norm["edges"]), xs
    )
    state_hat = jnp.concatenate([state[:, :1], jnp.moveaxis(states_hat, 0, 1)], axis=1)
    output_hat = jnp.moveaxis(outputs_hat, 0, 1)
    new_norm = {"nodes": n_nodes, "edges": n_edges, "output": norm_out}
    return state_hat, output_hat, target, new_norm
