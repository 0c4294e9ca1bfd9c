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
