"""GATv2 on a static 4-neighbour pixel grid, scatter-free.

The reference's MLPGNN decoder runs a 3-layer torch-geometric ``GATv2Conv``
stack over a fixed grid graph built once from index arithmetic
(``src/models/layers/GNN/GCN.py:6-52``, edge builder
``GNN/decoders.py:275-300``).  torch-geometric needs CUDA scatter/segment
kernels; on TPU the fixed degree-<=5 topology (4 neighbours + the self-loop
that ``add_self_loops=True`` appends) lets us express the whole conv as dense
slot-wise gathers + masked softmax — pure VPU/MXU work with static shapes,
no scatter at all.

Semantics match ``GATv2Conv`` (Brody et al. 2022; torch-geometric defaults:
``share_weights=False``, ``negative_slope=0.2``, attention dropout on alpha):

    e_ij    = att . leaky_relu(lin_l(x_j) + lin_r(x_i))
    alpha_i = softmax_j(e_ij)   over j in N(i) u {i}
    out_i   = sum_j alpha_ij * lin_l(x_j)   (+ bias)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]

NEG_SLOPE = 0.2
# slot order: self, -x, +x, -y, +y
_SHIFTS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    s = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -s, s)


def gatv2_conv_init(key, in_dim: int, out_dim: int, heads: int = 1, bias: bool = True) -> Params:
    kl, kr, ka = jax.random.split(key, 3)
    p: Params = {
        "lin_l": {"w": _glorot(kl, (in_dim, heads * out_dim))},
        "lin_r": {"w": _glorot(kr, (in_dim, heads * out_dim))},
        "att": _glorot(ka, (1, heads, out_dim)).reshape(heads, out_dim),
    }
    if bias:
        p["lin_l"]["b"] = jnp.zeros((heads * out_dim,))
        p["lin_r"]["b"] = jnp.zeros((heads * out_dim,))
        p["bias"] = jnp.zeros((heads * out_dim,))  # concat=True layout
    return p


def _shift_grid(x: jnp.ndarray, dx: int, dy: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Value of neighbour (x+dx, y+dy) at each pixel + validity mask.

    x: (..., X, Y, F).  Out-of-grid slots are masked.
    """
    X, Y = x.shape[-3], x.shape[-2]
    shifted = jnp.roll(x, shift=(-dx, -dy), axis=(-3, -2))
    valid = jnp.ones((X, Y), bool)
    if dx == 1:
        valid = valid.at[-1, :].set(False)
    elif dx == -1:
        valid = valid.at[0, :].set(False)
    if dy == 1:
        valid = valid.at[:, -1].set(False)
    elif dy == -1:
        valid = valid.at[:, 0].set(False)
    return shifted, valid


def gatv2_conv_apply(
    params: Params,
    x: jnp.ndarray,
    heads: int,
    out_dim: int,
    *,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    allow_fused: bool = True,
) -> jnp.ndarray:
    """x: (..., X, Y, in_dim) -> (..., X, Y, heads*out_dim) (concat layout)."""
    dtype = x.dtype

    def lin(p, v):
        y = v @ p["w"].astype(dtype)
        if "b" in p:
            y = y + p["b"].astype(dtype)
        return y

    x_l = lin(params["lin_l"], x)  # source transform, (..., X, Y, H*C)
    x_r = lin(params["lin_r"], x)  # target transform

    lead = x.shape[:-1]
    x_r_h = x_r.reshape(*lead, heads, out_dim)

    att = params["att"].astype(dtype)  # (heads, out_dim)

    # fused Pallas path: ~3 VMEM-resident passes instead of ~25 HBM passes,
    # forward and backward (channels-first kernels; FLUID_GNN_FUSED_BWD=0
    # opts the backward out to XLA recompute — see grid_gnn_pallas.py)
    if allow_fused and not (dropout > 0.0 and rng is not None):
        try:
            from fluid_llm_tpu.ops import grid_gnn_pallas as gp

            if jax.default_backend() == "tpu" and gp.supported(x_l.shape, heads, out_dim):
                bf_shape = (-1,) + x_l.shape[-3:]
                out = gp.fused_slot_attention(
                    x_l.reshape(bf_shape), x_r.reshape(bf_shape),
                    params["att"].astype(x_l.dtype), heads, out_dim,
                )
                out = out.reshape(*lead, heads * out_dim)
                if "bias" in params:
                    out = out + params["bias"].astype(dtype)
                return out
        except Exception as e:  # fall through to the XLA formulation
            from fluid_llm_tpu.utils import kernel_fallback

            kernel_fallback("fused grid-GATv2 kernel", e)

    if dropout > 0.0 and rng is not None:
        # attention-dropout path needs explicit alphas: materialise slots
        logits, values, masks = [], [], []
        for dx, dy in _SHIFTS:
            xj_flat, valid = _shift_grid(x_l, dx, dy)
            xj = xj_flat.reshape(*lead, heads, out_dim)
            e = jax.nn.leaky_relu(x_r_h + xj, NEG_SLOPE)
            logits.append(jnp.einsum("...hc,hc->...h", e, att))
            values.append(xj)
            masks.append(valid)
        logits = jnp.stack(logits, axis=-2)  # (..., X, Y, S, H)
        values = jnp.stack(values, axis=-3)  # (..., X, Y, S, H, C)
        mask = jnp.stack(masks, axis=-1)[..., :, None]  # (X, Y, S, 1)
        logits = jnp.where(mask, logits.astype(jnp.float32), -jnp.inf)
        alpha = jax.nn.softmax(logits, axis=-2).astype(dtype)
        keep = jax.random.bernoulli(rng, 1.0 - dropout, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout), 0.0)
        out = jnp.einsum("...shc,...sh->...hc", values, alpha)
    else:
        # two-pass online softmax over the (at most 5) slots: never stacks
        # the (..., S, H, C) values tensor — the decoder runs this over the
        # full pixel grid, so the saved HBM intermediate is large
        m = jnp.full((*lead, heads), -jnp.inf, jnp.float32)
        for dx, dy in _SHIFTS:
            xj_flat, valid = _shift_grid(x_l, dx, dy)
            xj = xj_flat.reshape(*lead, heads, out_dim)
            e = jax.nn.leaky_relu(x_r_h + xj, NEG_SLOPE)
            logit = jnp.einsum("...hc,hc->...h", e, att).astype(jnp.float32)
            logit = jnp.where(valid[..., None], logit, -jnp.inf)
            m = jnp.maximum(m, logit)
        denom = jnp.zeros((*lead, heads), jnp.float32)
        acc = jnp.zeros((*lead, heads, out_dim), jnp.float32)
        for dx, dy in _SHIFTS:
            xj_flat, valid = _shift_grid(x_l, dx, dy)
            xj = xj_flat.reshape(*lead, heads, out_dim)
            e = jax.nn.leaky_relu(x_r_h + xj, NEG_SLOPE)
            logit = jnp.einsum("...hc,hc->...h", e, att).astype(jnp.float32)
            w = jnp.where(valid[..., None], jnp.exp(logit - m), 0.0)
            denom = denom + w
            acc = acc + w[..., None] * xj.astype(jnp.float32)
        out = (acc / denom[..., None]).astype(dtype)

    out = out.reshape(*lead, heads * out_dim)
    if "bias" in params:
        out = out + params["bias"].astype(dtype)
    return out


# -- GCN_layers-equivalent stack (``GNN/GCN.py:6-52``) -----------------------


def grid_gat_stack_init(
    key, in_dim: int, hid_dim: int, out_dim: int, num_layers: int, heads: int = 1
) -> Params:
    """Mirror of the reference stack construction (``GCN.py:22-31``)."""
    if num_layers == 1:
        return {"convs": [], "out": gatv2_conv_init(key, in_dim, out_dim, heads=1, bias=False)}
    keys = jax.random.split(key, num_layers)
    convs = [gatv2_conv_init(keys[0], in_dim, hid_dim // heads, heads=heads)]
    for i in range(num_layers - 2):
        convs.append(gatv2_conv_init(keys[1 + i], hid_dim, hid_dim // heads, heads=heads))
    out = gatv2_conv_init(keys[-1], hid_dim, out_dim, heads=1)
    return {"convs": convs, "out": out}


def grid_gat_stack_apply(
    params: Params,
    x: jnp.ndarray,
    hid_dim: int,
    out_dim: int,
    heads: int = 1,
    *,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    allow_fused: bool = True,
) -> jnp.ndarray:
    """x: (..., X, Y, in_dim) -> (..., X, Y, out_dim); softplus between convs
    (``GCN.py:46-50``)."""
    n_drop = len(params["convs"]) + 1
    rngs = jax.random.split(rng, n_drop) if (rng is not None and dropout > 0) else [None] * n_drop
    for i, conv in enumerate(params["convs"]):
        x = gatv2_conv_apply(conv, x, heads, hid_dim // heads, dropout=dropout,
                             rng=rngs[i], allow_fused=allow_fused)
        x = jax.nn.softplus(x)
    return gatv2_conv_apply(params["out"], x, 1, out_dim, dropout=dropout,
                            rng=rngs[-1], allow_fused=allow_fused)
