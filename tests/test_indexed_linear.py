"""Pallas indexed-linear kernel: math parity with the slice+matmul formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops.indexed_linear import (
    _xla_indexed_linear,
    indexed_linear,
)


@pytest.mark.parametrize("m,k,n", [(61, 768, 2304), (661, 768, 768), (8, 256, 128)])
@pytest.mark.parametrize("bias", [True, False])
def test_indexed_linear_interpret_parity(m, k, n, bias):
    rng = np.random.default_rng(0)
    nl = 4
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(nl, k, n)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(nl, n)).astype(np.float32)) if bias else None
    for li in (0, nl - 1):
        ref = _xla_indexed_linear(x, w, b, jnp.int32(li))
        out = indexed_linear(x, w, b, jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_indexed_linear_traced_index_and_lead_dims():
    """Works under jit with a traced layer index, batched x, and in a scan."""
    rng = np.random.default_rng(1)
    nl, bs, L, d = 3, 2, 5, 128
    x = jnp.asarray(rng.normal(size=(bs, L, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(nl, d, d)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.normal(size=(nl, d)).astype(np.float32))

    one = jax.jit(lambda h: indexed_linear(h, w, b, jnp.int32(1)))(x)
    ref_one = _xla_indexed_linear(x.reshape(-1, d), w, b, jnp.int32(1)).reshape(bs, L, d)
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref_one), atol=1e-4)

    def scan_fn(h, li):
        return indexed_linear(h, w, b, li), None

    out, _ = jax.jit(lambda h: jax.lax.scan(scan_fn, h, jnp.arange(nl)))(x)
    ref = x
    for li in range(nl):
        ref = _xla_indexed_linear(ref.reshape(-1, d), w, b, jnp.int32(li)).reshape(bs, L, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
