"""Short-attention fused kernel: parity with the XLA masked formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops.short_attention import (
    _xla_reference,
    short_attention,
)


@pytest.mark.parametrize("L,n_invalid", [(61, 0), (64, 7), (128, 61)])
def test_short_attention_interpret_parity(L, n_invalid):
    rng = np.random.default_rng(0)
    bs, H, hd = 2, 3, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
        for _ in range(3)
    )
    # invalid tokens at the FRONT, like the right-aligned rollout window
    valid = jnp.asarray(np.arange(L)[None, :] >= n_invalid) | jnp.zeros((bs, L), bool)

    ref = _xla_reference(q, k, v, valid)
    out = short_attention(q, k, v, valid, True)
    # compare only rows whose outputs are consumed (valid queries)
    w = np.asarray(valid)[:, :, None, None]
    diff = np.abs(np.asarray(out) - np.asarray(ref)) * w
    np.testing.assert_array_less(diff.max(), 2e-5)


def test_short_attention_grad_matches_xla():
    """custom_vjp backward (XLA recompute) equals differentiating the
    reference formulation directly."""
    rng = np.random.default_rng(1)
    bs, L, H, hd = 1, 33, 2, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
        for _ in range(3)
    )
    valid = jnp.ones((bs, L), bool)

    def loss_kernel(q, k, v):
        return jnp.sum(short_attention(q, k, v, valid, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, valid) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
