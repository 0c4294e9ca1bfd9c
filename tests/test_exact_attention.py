"""Exact-window packed causal attention kernel (``ops/exact_attention``).

Interpret-mode parity on CPU; the hardware half is
``tools/tpu_smoke.py::check_exact_attention``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.ops import exact_attention as xa


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


@pytest.mark.parametrize("n_invalid", [0, 37])
def test_kernel_matches_xla_packed(n_invalid):
    """Kernel (interpret) == the XLA twin, with and without invalid tokens
    (the rollout's masked window), across uneven query blocks (L=300)."""
    bs, L, H, hd = 2, 300, 4, 32
    D = H * hd
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, bs, L, D) for kk in ks)
    valid = (jnp.arange(L)[None, :] >= n_invalid).astype(jnp.int32)
    valid = jnp.broadcast_to(valid, (bs, L))
    ref = xa._xla_packed(q, k, v, valid, H, hd)
    out = xa.causal_attention(q, k, v, valid, H, hd, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_kernel_through_backbone_apply(monkeypatch):
    """bb.apply with the kernel forced (interpret) == the XLA path, on a
    masked window like the rollout's."""
    cfg = bb.BackboneConfig(
        family="opt", n_layers=2, d_model=128, n_heads=4, d_ff=256,
        max_pos=512, dropout=0.0,
    )
    params = bb.init_params(jax.random.PRNGKey(0), cfg)
    bs, L = 2, 260
    x = _rand(jax.random.PRNGKey(1), bs, L, cfg.d_model)
    valid = jnp.broadcast_to(jnp.arange(L)[None, :] >= 20, (bs, L))

    monkeypatch.setenv("FLUID_EXACT_ATTN", "xla")
    ref = bb.apply(params, cfg, x, valid)
    monkeypatch.setenv("FLUID_EXACT_ATTN", "interpret")
    assert xa.use_kernel(cfg, L) == (True, True)
    got = bb.apply(params, cfg, x, valid)
    np.testing.assert_allclose(
        np.asarray(got)[np.asarray(valid)], np.asarray(ref)[np.asarray(valid)],
        atol=3e-5, rtol=1e-5,
    )


def test_custom_vjp_gradients_match_xla():
    """notf-mode training differentiates through the rollout: the kernel's
    custom_vjp (XLA-recompute backward) must give the XLA path's grads."""
    bs, L, H, hd = 1, 288, 4, 32
    D = H * hd
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v = (_rand(kk, bs, L, D) for kk in ks[:3])
    w = _rand(ks[3], bs, L, D)
    valid = jnp.ones((bs, L), jnp.int32)

    def loss_kernel(q, k, v):
        return jnp.sum((xa.causal_attention(q, k, v, valid, H, hd, True) * w) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum((xa._xla_packed(q, k, v, valid, H, hd) * w) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_supported_gates():
    cfg = bb.BackboneConfig(
        family="opt", n_layers=1, d_model=128, n_heads=4, d_ff=256,
    )
    assert xa.supported(cfg, 661)
    assert not xa.supported(cfg, 64)  # too short: XLA wins, kernel off
    gqa = bb.BackboneConfig(
        family="llama", n_layers=1, d_model=128, n_heads=4, d_ff=256,
        n_kv_heads=2,
    )
    assert not xa.supported(gqa, 661)
