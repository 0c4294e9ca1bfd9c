"""GraphViT baseline: GNN encoder + cluster pooling + transformer + retrieve.

Functional equivalent of ``eagle/Models/GraphViT.py:12-227``:

- sin/cos positional encoder over absolute node positions and positions
  relative to (constrained-kmeans) cluster centres (``:189-227``),
- GNN encoder: node/edge MLPs + 4 residual message-passing blocks with the
  positional features concatenated at each block input (``:156-186``),
- GraphPooling: a GRU runs over each cluster's member nodes; the hidden
  state at the last real member becomes the cluster token (``:98-126``),
- 4 pre-LN multi-head attention blocks over cluster tokens, with ghost
  clusters masked out of the keys except the diagonal (``:44-51,73-95``),
- GraphRetrieveSimple: broadcast tokens back to member nodes, one GNN block,
  tanh MLP head (``:129-153``),
- residual state update with boundary forcing per step (``:36-63``).

The time loop is a ``lax.scan``; clusters/masks are static-shape
(ghost-padded by the dataloader).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.models.baselines.base import (
    _torch_linear_init,
    gnn_apply,
    gnn_init,
    mlp_apply,
    mlp_init,
)
from fluid_llm_tpu.models.baselines.mgn import (
    bc_mask_from_types,
    edge_features,
    noise_mask_from_types,
)
from fluid_llm_tpu.ops.segment_ops import gather_nodes, segment_sum_nodes

Params = dict[str, Any]

POS_START = -3
POS_LENGTH = 8
POS_DIM = 4 * POS_LENGTH  # embed of a 2-D point: 2 coords x (cos,sin) x lengths


def pos_embed(pos: jnp.ndarray) -> jnp.ndarray:
    """``GraphViT.py:218-227``: multi-frequency sin/cos features."""
    index = jnp.arange(POS_START, POS_START + POS_LENGTH, dtype=jnp.float32)
    freq = (2.0**index) * math.pi
    ang = pos[..., None] * freq  # (..., d, P)
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # (..., d, 2P)
    return emb.reshape(*pos.shape[:-1], pos.shape[-1] * 2 * POS_LENGTH)


def _member_ids(clusters, cluster_mask, n_rows: int):
    """Flattened member node ids with ghost slots remapped OUT OF RANGE
    (``>= n_rows``) so the window-local kernels drop them (zero-row gather
    / scatter-drop, ``ops/segment_ops``)."""
    B = clusters.shape[0]
    flat = clusters.reshape(B, -1).astype(jnp.int32)
    mask = cluster_mask.reshape(B, -1) > 0
    return jnp.where(mask, flat, jnp.int32(n_rows))


def positional_encoder(mesh_pos, clusters, cluster_mask, cluster_window: int = 0):
    """``GraphViT.py:196-216``.

    mesh_pos: (B, N, 2); clusters: (B, C, K) int (ghost index >= N);
    cluster_mask: (B, C, K) 1/0.  Returns (node posenc (B, N, 2*POS_DIM),
    cluster posenc (B, C, POS_DIM)).

    ``cluster_window`` (static): >0 promises the member-id chunks are
    window-local at that width (cluster-major node order from
    ``data/reorder.py``; collate-verified) — gathers/scatters ride the
    Pallas MXU kernels and ghost slots are dropped, so the GHOST node row
    of the scatter output is 0 instead of the reference's
    last-written-wins garbage (loss-masked either way).
    """
    B, N, _ = mesh_pos.shape
    _, C, K = clusters.shape
    flat = clusters.reshape(B, C * K)
    if cluster_window > 0:
        ids = _member_ids(clusters, cluster_mask, N)
        pos_by_cluster = gather_nodes(
            mesh_pos, ids, windowed=True, window=cluster_window,
        ).reshape(B, C, K, 2)
    else:
        pos_by_cluster = gather_nodes(  # cluster ids: unsorted by design
            jnp.pad(mesh_pos, ((0, 0), (0, 1), (0, 0))), jnp.minimum(flat, N),
            windowed=False,
        ).reshape(B, C, K, 2)

    centers = jnp.sum(pos_by_cluster * cluster_mask[..., None], axis=-2)
    centers = centers / (jnp.sum(cluster_mask, axis=-1, keepdims=True) + 1e-8)

    rel = centers[:, :, None] - pos_by_cluster  # (B, C, K, 2)
    rel_emb = pos_embed(rel).reshape(B, C * K, POS_DIM)

    # scatter member embeddings back to node order (``:211-213``); every
    # real node belongs to exactly one cluster so set == sum on real rows
    if cluster_window > 0:
        scat = segment_sum_nodes(rel_emb, ids, N, windowed=True,
                                 window=cluster_window)
    else:
        scat = jax.vmap(lambda base, idx, val: base.at[idx].set(val))(
            jnp.zeros((B, N + 1, POS_DIM)), jnp.minimum(flat, N), rel_emb
        )[:, :N]
    node_enc = jnp.concatenate([pos_embed(mesh_pos), scat], axis=-1)
    return node_enc, pos_embed(centers)


# -- GRU (torch nn.GRU parity) ----------------------------------------------


def gru_init(key, input_size, hidden_size):
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden_size)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(k[0], (input_size, 3 * hidden_size)),
        "w_hh": u(k[1], (hidden_size, 3 * hidden_size)),
        "b_ih": u(k[2], (3 * hidden_size,)),
        "b_hh": u(k[3], (3 * hidden_size,)),
    }


def gru_scan(p: Params, x: jnp.ndarray, hidden_size: int) -> jnp.ndarray:
    """x: (B, L, In) -> outputs (B, L, H) (torch GRU gate order r, z, n)."""
    x = x.astype(p["w_ih"].dtype)  # compute follows the param dtype
    B = x.shape[0]

    def cell(h, xt):
        gi = xt @ p["w_ih"] + p["b_ih"]
        gh = h @ p["w_hh"] + p["b_hh"]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((B, hidden_size), dtype=x.dtype)  # carry in compute dtype
    _, outs = jax.lax.scan(cell, h0, jnp.moveaxis(x, 1, 0))
    return jnp.moveaxis(outs, 0, 1)


# -- multi-head attention (torch nn.MultiheadAttention parity) ---------------


def mha_init(key, embed_dim):
    k1, k2 = jax.random.split(key)
    # torch packs qkv into in_proj with xavier init
    s = math.sqrt(6.0 / (embed_dim + embed_dim))
    in_w = jax.random.uniform(k1, (embed_dim, 3 * embed_dim), jnp.float32, -s, s)
    out = _torch_linear_init(k2, embed_dim, embed_dim)
    return {"in_w": in_w, "in_b": jnp.zeros((3 * embed_dim,)), "out": out}


def mha_apply(p: Params, x: jnp.ndarray, attn_mask: jnp.ndarray, n_heads: int):
    """x: (B, L, E); attn_mask: (B, L, L) bool, True = disallowed."""
    x = x.astype(p["in_w"].dtype)  # compute follows the param dtype
    B, L, E = x.shape
    hd = E // n_heads
    qkv = x @ p["in_w"] + p["in_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, n_heads, hd)

    logits = jnp.einsum("bqhd,bkhd->bhqk", heads(q), heads(k),
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = jnp.where(attn_mask[:, None], -1e30, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, heads(v)).reshape(B, L, E)
    return out @ p["out"]["w"] + p["out"]["b"]


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _ln(x, p):
    x32 = x.astype(jnp.float32)  # stable LN stats under bf16 compute
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) \
        * p["scale"] + p["bias"]


# -- model -------------------------------------------------------------------


def graphvit_init(
    key, state_size: int = 4, w_size: int = 512, n_attention: int = 4,
    nb_gn: int = 4, n_heads: int = 4,
) -> Params:
    keys = jax.random.split(key, nb_gn + n_attention * 3 + 8)
    it = iter(keys)
    node_size = 128 + POS_DIM * 2
    embed_dim = w_size + POS_DIM

    enc_gn = [
        gnn_init(next(it), node_size=node_size, edge_size=128, output_size=128, layer_norm=True)
        for _ in range(nb_gn)
    ]
    attn = []
    for _ in range(n_attention):
        attn.append(
            {
                "ln1": _ln_init(w_size),
                "mha": mha_init(next(it), embed_dim),
                "linear": _torch_linear_init(next(it), embed_dim, w_size),
                "ln2": _ln_init(w_size),
                "mlp": mlp_init(next(it), w_size, w_size, n_hidden=1,
                                hidden_size=w_size, layer_norm=False),
            }
        )
    retrieve_node_size = w_size + 128 + POS_DIM * 2
    fk = jax.random.split(next(it), 3)
    return {
        "encoder_node": mlp_init(next(it), 9 + state_size, 128, n_hidden=1, layer_norm=False),
        "encoder_edge": mlp_init(next(it), 3, 128, n_hidden=1, layer_norm=False),
        "encoder_gn": enc_gn,
        "pool_gru": gru_init(next(it), 128 + POS_DIM * 2, w_size),
        "pool_mlp": mlp_init(next(it), w_size, w_size, n_hidden=1, layer_norm=False),
        "attention": attn,
        "ln": _ln_init(w_size),
        "retrieve_gnn": gnn_init(next(it), node_size=retrieve_node_size, output_size=128),
        "final_mlp": [
            _torch_linear_init(fk[0], 128, 128),
            _torch_linear_init(fk[1], 128, 128),
            _torch_linear_init(fk[2], 128, state_size),
        ],
    }


def _encoder(params, mesh_pos, edges, states, node_type, pos_enc,
             rev_window: int = 0):
    """``GraphViT.py:156-186``."""
    V_in = jnp.concatenate([states, node_type.astype(states.dtype)], axis=-1)
    E = mlp_apply(params["encoder_edge"], edge_features(mesh_pos, edges, rev_window))
    V = mlp_apply(params["encoder_node"], V_in)
    pos_enc = pos_enc.astype(V.dtype)  # keep the gathers in compute dtype
    for gp in params["encoder_gn"]:
        inpt = jnp.concatenate([V, pos_enc], axis=-1)
        v, e = gnn_apply(gp, inpt, E, edges, rev_window)
        V = V + v
        E = E + e
    return V, E


def _pooling(params, V, clusters, pos_enc, cluster_mask, cluster_window: int = 0):
    """``GraphViT.py:98-126``: GRU over members, output at last real index.

    With ``cluster_window`` > 0, ghost member slots gather ZERO rows
    instead of the padded ghost-node row; the GRU hidden picked at the
    last REAL member (``idx``) is identical either way (ghosts trail)."""
    B, N, F = V.shape
    _, C, K = clusters.shape
    pos_enc = pos_enc.astype(V.dtype)
    if cluster_window > 0:
        ids = _member_ids(clusters, cluster_mask, N)
        v_by_cluster = gather_nodes(
            V, ids, windowed=True, window=cluster_window).reshape(B, C, K, F)
        pos_by_cluster = gather_nodes(
            pos_enc, ids, windowed=True, window=cluster_window,
        ).reshape(B, C, K, -1)
    else:
        flat = jnp.minimum(clusters.reshape(B, C * K), N)
        Vp = jnp.pad(V, ((0, 0), (0, 1), (0, 0)))
        pos_p = jnp.pad(pos_enc, ((0, 0), (0, 1), (0, 0)))
        v_by_cluster = gather_nodes(Vp, flat, windowed=False).reshape(B, C, K, F)
        pos_by_cluster = gather_nodes(pos_p, flat, windowed=False).reshape(B, C, K, -1)
    inpt = jnp.concatenate([v_by_cluster, pos_by_cluster], axis=-1)

    # hidden size derived from the pooling MLP's output width
    w = params["pool_mlp"]["layers"][-1]["w"].shape[1]
    out = gru_scan(params["pool_gru"], inpt.reshape(B * C, K, -1), w)
    idx = (jnp.sum(cluster_mask, axis=-1).astype(jnp.int32) - 1).reshape(B * C)
    idx = jnp.where(idx == -1, K - 1, idx)
    # dense one-hot select over K (exact: one slot is 1, the rest 0).  The
    # take_along_axis it replaces lowered to a SERIALIZED row gather — the
    # single hottest op of the bf16 step (37.9 ms/step of 176, xplane
    # rollup r5) — and its backward to the matching serialized scatter;
    # K is tiny (~10) so reading all K rows once is ~free on the VPU.
    oh = (jax.lax.broadcasted_iota(jnp.int32, (B * C, K), 1)
          == idx[:, None]).astype(out.dtype)
    picked = jnp.einsum("gk,gkw->gw", oh, out)
    picked = mlp_apply(params["pool_mlp"], picked[:, None])[:, 0]
    return picked.reshape(B, C, w)


def _retrieve(params, W, V, clusters, pos_enc, edges, E,
              rev_window: int = 0, cluster_window: int = 0,
              cluster_mask=None):
    """``GraphViT.py:129-153``: broadcast tokens to nodes, GNN, tanh head."""
    B, N, _ = V.shape
    _, C, K = clusters.shape
    W = W.astype(V.dtype)
    pos_enc = pos_enc.astype(V.dtype)
    w_rep = jnp.repeat(W[:, :, None], K, axis=2).reshape(B, C * K, -1)
    if cluster_window > 0:
        # each real node is in exactly one cluster -> sum == set on real
        # rows; ghost slots are dropped (ghost node row 0, loss-masked)
        ids = _member_ids(clusters, cluster_mask, N)
        w_nodes = segment_sum_nodes(w_rep, ids, N, windowed=True,
                                    window=cluster_window)
    else:
        flat = jnp.minimum(clusters.reshape(B, C * K), N)
        w_nodes = jax.vmap(lambda base, idx, val: base.at[idx].set(val))(
            jnp.zeros((B, N + 1, w_rep.shape[-1])), flat, w_rep
        )[:, :N]

    nodes = jnp.concatenate([V, w_nodes, pos_enc], axis=-1)
    nodes, _ = gnn_apply(params["retrieve_gnn"], nodes, E, edges, rev_window)
    h = nodes
    for i, lp in enumerate(params["final_mlp"]):
        h = h @ lp["w"] + lp["b"]
        if i < 2:
            h = jnp.tanh(h)
    return h


def graphvit_step(params, mesh_pos, edges, state, node_type, clusters, cluster_mask,
                  n_heads: int = 4, rev_window: int = 0, cluster_window: int = 0):
    """One diff prediction for the current state (``GraphViT.py:38-55``)."""
    node_enc, cluster_enc = positional_encoder(mesh_pos, clusters, cluster_mask,
                                               cluster_window)
    V, E = _encoder(params, mesh_pos, edges, state, node_type, node_enc, rev_window)
    W = _pooling(params, V, clusters, node_enc, cluster_mask, cluster_window)

    # ghost clusters masked out of the keys, diagonal kept (``:43-48``)
    C = W.shape[1]
    ghost = jnp.sum(cluster_mask, axis=-1) == 0  # (B, C)
    attn_mask = ghost[:, None, :] & ~jnp.eye(C, dtype=bool)[None]

    for blk in params["attention"]:
        w1 = _ln(W, blk["ln1"])
        w1p = jnp.concatenate([w1, cluster_enc], axis=-1)
        w2 = mha_apply(blk["mha"], w1p, attn_mask, n_heads)
        w3 = W + (w2 @ blk["linear"]["w"] + blk["linear"]["b"])
        w5 = mlp_apply(blk["mlp"], _ln(w3, blk["ln2"]))
        W = w3 + w5
    W = _ln(W, params["ln"])
    return _retrieve(params, W, V, clusters, node_enc, edges, E,
                     rev_window, cluster_window, cluster_mask)


def graphvit_apply(
    params: Params,
    mesh_pos: jnp.ndarray,
    edges: jnp.ndarray,
    state: jnp.ndarray,
    node_type: jnp.ndarray,
    clusters: jnp.ndarray,
    cluster_mask: jnp.ndarray,
    *,
    n_heads: int = 4,
    apply_noise: bool = False,
    noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
    rev_window: int = 0,
    cluster_window: int = 0,
):
    """Window rollout (``GraphViT.py:27-71``); shapes as in the reference,
    with (B, T, ...) leading.  ``rev_window``/``cluster_window`` (static):
    see ``base.gnn_apply`` / ``positional_encoder`` — Pallas-kernel
    dispatch for the reverse-edge and cluster gathers/scatters.  Returns
    (state_hat, output_hat, target)."""
    if apply_noise and rng is not None and noise_std > 0:
        nm = noise_mask_from_types(node_type[:, 0])
        noise = jax.random.normal(rng, state[:, 0].shape) * noise_std
        state = state.at[:, 0].set(
            jnp.where(nm[..., None], state[:, 0] + noise, state[:, 0])
        )

    def step(prev, xs):
        mesh_t, edges_t, nt_prev, nt_t, state_t, cl_t, cm_t = xs
        out = graphvit_step(params, mesh_t, edges_t, prev, nt_prev, cl_t, cm_t,
                            n_heads, rev_window, cluster_window)
        next_state = prev + out
        target = state_t - prev
        mask = bc_mask_from_types(nt_t)
        next_state = jnp.where(mask[..., None], state_t, next_state)
        return next_state, (next_state, out, target)

    tm = lambda x: jnp.moveaxis(x, 1, 0)
    xs = (
        tm(mesh_pos[:, :-1]), tm(edges[:, :-1]), tm(node_type[:, :-1]),
        tm(node_type[:, 1:]), tm(state[:, 1:]), tm(clusters[:, :-1]),
        tm(cluster_mask[:, :-1]),
    )
    _, (states_hat, outputs, targets) = jax.lax.scan(step, state[:, 0], xs)
    state_hat = jnp.concatenate([state[:, :1], jnp.moveaxis(states_hat, 0, 1)], axis=1)
    return state_hat, jnp.moveaxis(outputs, 0, 1), jnp.moveaxis(targets, 0, 1)


def graphvit_loss(output_hat, target, mask, alpha: float = 0.1):
    """``eagle/train_graphvit.py:79-88``: x10-scaled masked MSE."""
    m = mask[:, 1:, :, None].astype(output_hat.dtype)
    output_hat, target = output_hat * 10, target * 10
    loss_v = jnp.mean((target[..., :2] * m - output_hat[..., :2] * m) ** 2)
    loss_p = jnp.mean((target[..., 2:] * m - output_hat[..., 2:] * m) ** 2)
    return loss_v + alpha * loss_p
