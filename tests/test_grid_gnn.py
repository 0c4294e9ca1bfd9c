"""Grid GATv2: parity vs a scatter-based NumPy oracle of the PyG formula."""

import jax
import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.ops.grid_gnn import (
    NEG_SLOPE,
    gatv2_conv_apply,
    gatv2_conv_init,
    grid_gat_stack_apply,
    grid_gat_stack_init,
)


def oracle_gatv2(params, x, heads, out_dim):
    """Edge-list GATv2 (torch-geometric semantics) over the 4-neighbour grid
    with self-loops, computed with explicit scatter loops."""
    X, Y, F = x.shape
    n = X * Y
    xf = x.reshape(n, F)

    def lin(p, v):
        y = v @ np.asarray(p["w"])
        if "b" in p:
            y = y + np.asarray(p["b"])
        return y

    x_l = lin(params["lin_l"], xf).reshape(n, heads, out_dim)
    x_r = lin(params["lin_r"], xf).reshape(n, heads, out_dim)
    att = np.asarray(params["att"])

    # edges: 4-neighbour + self loops
    edges = []
    for i in range(X):
        for j in range(Y):
            tgt = i * Y + j
            edges.append((tgt, tgt))
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < X and 0 <= jj < Y:
                    edges.append((ii * Y + jj, tgt))  # (source, target)

    out = np.zeros((n, heads, out_dim))
    for tgt in range(n):
        srcs = [s for s, t in edges if t == tgt]
        e = np.stack([x_r[tgt] + x_l[s] for s in srcs])  # (deg, H, C)
        e = np.where(e > 0, e, NEG_SLOPE * e)
        logits = (e * att).sum(-1)  # (deg, H)
        alpha = np.exp(logits - logits.max(0))
        alpha = alpha / alpha.sum(0)
        out[tgt] = (alpha[:, :, None] * np.stack([x_l[s] for s in srcs])).sum(0)
    out = out.reshape(n, heads * out_dim)
    if "bias" in params:
        out = out + np.asarray(params["bias"])
    return out.reshape(X, Y, heads * out_dim)


def test_gatv2_matches_edge_list_oracle(rng):
    X, Y, F, H, C = 5, 4, 6, 2, 3
    params = gatv2_conv_init(jax.random.PRNGKey(0), F, C, heads=H)
    x = jnp.asarray(rng.normal(size=(X, Y, F)).astype(np.float32))
    ours = np.asarray(gatv2_conv_apply(params, x, H, C))
    ref = oracle_gatv2(params, np.asarray(x), H, C)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gatv2_batched_consistent(rng):
    X, Y, F, H, C = 6, 5, 4, 1, 4
    params = gatv2_conv_init(jax.random.PRNGKey(1), F, C, heads=H)
    xb = jnp.asarray(rng.normal(size=(3, X, Y, F)).astype(np.float32))
    out_b = np.asarray(gatv2_conv_apply(params, xb, H, C))
    for b in range(3):
        single = np.asarray(gatv2_conv_apply(params, xb[b], H, C))
        np.testing.assert_allclose(out_b[b], single, atol=1e-6)


def test_stack_shapes(rng):
    params = grid_gat_stack_init(jax.random.PRNGKey(2), 8, 12, 3, num_layers=3, heads=2)
    x = jnp.asarray(rng.normal(size=(2, 10, 6, 8)).astype(np.float32))
    out = grid_gat_stack_apply(params, x, 12, 3, heads=2)
    assert out.shape == (2, 10, 6, 3)
    assert np.isfinite(np.asarray(out)).all()


def _xla_slot_attention(xl, xr, att, heads, cdim):
    """Dense reference for the fused kernel (same math as gatv2_conv_apply
    after the linear transforms)."""
    from fluid_llm_tpu.ops.grid_gnn import _SHIFTS, _shift_grid

    lead = xl.shape[:-1]
    xr_h = xr.reshape(*lead, heads, cdim)
    logits, values, masks = [], [], []
    for dx, dy in _SHIFTS:
        xj_flat, valid = _shift_grid(xl, dx, dy)
        xj = xj_flat.reshape(*lead, heads, cdim)
        e = jax.nn.leaky_relu(xr_h + xj, NEG_SLOPE)
        logits.append(jnp.einsum("...hc,hc->...h", e, att))
        values.append(xj)
        masks.append(valid)
    logits = jnp.stack(logits, axis=-2)
    values = jnp.stack(values, axis=-3)
    mask = jnp.stack(masks, axis=-1)[..., :, None]
    logits = jnp.where(mask, logits, -jnp.inf)
    alpha = jax.nn.softmax(logits, axis=-2)
    out = jnp.einsum("...shc,...sh->...hc", values, alpha)
    return out.reshape(*lead, heads * cdim)


def test_fused_kernel_matches_xla_interpret(rng):
    from fluid_llm_tpu.ops.grid_gnn_pallas import fused_slot_attention

    Bf, X, Y, H, C = 2, 8, 8, 2, 4
    xl = jnp.asarray(rng.normal(size=(Bf, X, Y, H * C)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(Bf, X, Y, H * C)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32))

    out = fused_slot_attention(xl, xr, att, H, C, True)
    ref = _xla_slot_attention(xl, xr, att, H, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_kernel_grads_match_interpret(rng):
    from fluid_llm_tpu.ops.grid_gnn_pallas import fused_slot_attention

    Bf, X, Y, H, C = 1, 8, 8, 1, 4
    xl = jnp.asarray(rng.normal(size=(Bf, X, Y, H * C)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(Bf, X, Y, H * C)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(Bf, X, Y, H * C)).astype(np.float32))

    def loss_fused(xl_, xr_, att_):
        return ((fused_slot_attention(xl_, xr_, att_, H, C, True) - tgt) ** 2).sum()

    def loss_ref(xl_, xr_, att_):
        return ((_xla_slot_attention(xl_, xr_, att_, H, C) - tgt) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(xl, xr, att)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(xl, xr, att)
    for a, b, name in zip(g1, g2, ["xl", "xr", "att"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)
