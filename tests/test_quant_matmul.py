"""Pallas int8-weight matmul (``ops/quant_matmul.py``) parity tests.

The kernel's contract: bit-for-bit the same contraction as the XLA
dequant path up to accumulation order — dequantisation commutes with the
matmul because the scale is per output column, and int8 -> bf16 casts are
exact (|q| <= 127 < 256).  CPU interpret mode here; the on-chip run is
re-qualified every round by ``tpu_smoke quant_matmul``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops.quant import dequantize_weight, quantize_weight
from fluid_llm_tpu.ops.quant_matmul import int8_matmul, pick_blocks, use_kernel


@pytest.mark.parametrize("mode,atol", [("w8a16", 0.08), ("w8a8", 0.25)])
@pytest.mark.parametrize(
    "m,k,n",
    [
        (60, 768, 768),    # streaming decode frame x qkv-ish
        (61, 768, 2304),   # fused qkv width (odd M exercises row padding)
        (128, 3072, 768),  # fc2 (K loop: BK=1536, nk=2)
        (5, 768, 3072),    # fc1, tiny M (BM pad)
        (488, 384, 128),   # multi-M-block + small dims
    ],
)
def test_matches_xla_dequant(m, k, n, mode, atol):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32) * 0.02
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    qp = quantize_weight(w)
    ref = (x @ dequantize_weight(qp, jnp.bfloat16)).astype(jnp.float32)
    got = int8_matmul(x, qp["q"], qp["scale"], True, mode).astype(jnp.float32)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    # w8a16: identical contraction up to bf16 rounding of the weight copy
    # (the kernel scales in f32 after accumulation — if anything, tighter).
    # w8a8 adds per-token int8 activation rounding (~1/254 relative).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=atol, rtol=0.03)


@pytest.mark.parametrize("mode", ["w8a16", "w8a8"])
def test_leading_axes_flattened(mode):
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    qp = quantize_weight(w)
    x = jnp.asarray(rng.normal(size=(2, 3, 128)), jnp.bfloat16)
    got = int8_matmul(x, qp["q"], qp["scale"], True, mode)
    assert got.shape == (2, 3, 256)
    flat = int8_matmul(x.reshape(6, 128), qp["q"], qp["scale"], True, mode)
    np.testing.assert_array_equal(np.asarray(got.reshape(6, 256)), np.asarray(flat))


def test_w8a8_activation_quant_exact_on_integer_grids():
    """With integer activations whose per-row absmax is exactly 127 the
    dynamic absmax scale is 1, so the w8a8 quantisation is EXACT and the
    only difference vs the dequant oracle is f32 summation order."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.integers(-3, 4, size=(128, 128)), jnp.float32)
    qp = quantize_weight(w)
    xi = rng.integers(-126, 127, size=(8, 128))
    xi[:, 0] = 127  # pin per-row absmax -> sx == 1 exactly
    x = jnp.asarray(xi, jnp.float32)
    got = int8_matmul(x, qp["q"], qp["scale"], True, "w8a8")
    # same association as the kernel ((x @ q) * scale): the int products
    # and sums are < 2^24 so the f32 contraction is exact, proving the
    # activation quantisation added NO error.  (The dequant oracle
    # rounds q*scale per element first — a different f32 association.)
    ref = (x @ qp["q"].astype(jnp.float32)) * qp["scale"][None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_scale_grad_is_true_derivative():
    """d/dscale is the real derivative of out = (x @ q) * scale, not the
    zero cotangent r4 shipped (ADVICE r4: wrong if scale is ever trained
    QLoRA-style).  Checked against jax.grad of the explicit dequant form
    in w8a16 mode (exact weight dequant — no activation quantization)."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32) * 0.05
    qp = quantize_weight(w)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)

    def f_kernel(s):
        return (int8_matmul(x, qp["q"], s, True, "w8a16").astype(jnp.float32) ** 2).sum()

    def f_explicit(s):
        return (((x @ qp["q"].astype(jnp.float32)) * s[None, :]) ** 2).sum()

    g_k = jax.grad(f_kernel)(qp["scale"])
    g_e = jax.grad(f_explicit)(qp["scale"])
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_e),
                               atol=1e-3, rtol=1e-3)


def test_grad_matches_dequant_twin():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32) * 0.05
    qp = quantize_weight(w)

    def f_kernel(x):
        return int8_matmul(x, qp["q"], qp["scale"], True).astype(jnp.float32).sum()

    def f_xla(x):
        return (x @ dequantize_weight(qp, jnp.bfloat16)).astype(jnp.float32).sum()

    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    g_k = jax.grad(f_kernel)(x)
    g_x = jax.grad(f_xla)(x)
    assert g_k.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(g_k, np.float32), np.asarray(g_x, np.float32),
        atol=2e-2, rtol=1e-2,
    )


def test_block_gating():
    assert pick_blocks(60, 768, 768) is not None
    assert pick_blocks(1, 4096, 11008) is not None  # LLaMA-7B mlp
    assert pick_blocks(8, 100, 768) is None  # K not lane-tileable
    assert pick_blocks(8, 768, 100) is None
    assert use_kernel(100, 768) == (False, False)


def test_linear_dispatch_parity(monkeypatch):
    """``backbone._linear`` routes 2-D int8 leaves through the kernel and
    the result matches the XLA dequant path (bias included)."""
    from fluid_llm_tpu.models import backbone as bb

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(128, 384)), jnp.float32) * 0.1
    p = {"w": quantize_weight(w), "b": jnp.asarray(rng.normal(size=(384,)), jnp.float32)}
    h = jnp.asarray(rng.normal(size=(2, 7, 128)), jnp.bfloat16)
    monkeypatch.setenv("FLUID_QMM", "interpret")
    got = bb._linear(h, p)
    monkeypatch.setenv("FLUID_QMM", "xla")
    ref = bb._linear(h, p)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02,
    )


def test_streaming_rollout_int8_kernel_matches_xla(monkeypatch):
    """Full streaming rollout with an int8-quantized backbone: the kernel
    path must match the XLA dequant path step for step (same storage, same
    numerics — only the HBM traffic differs)."""
    from fluid_llm_tpu.ops.quant import quantize_backbone
    from fluid_llm_tpu.rollout.streaming import generate_streaming
    from tests.test_streaming import llama_setup
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    cfg, ds, _, batch = llama_setup()
    model = FluidLLM.build(
        cfg, ds.ds_props(), n_layers=2, d_model=128, n_heads=4, d_ff=256,
        max_pos=4096, dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    params = dict(params, backbone=quantize_backbone(params["backbone"], mode="int8"))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = 3

    monkeypatch.setenv("FLUID_QMM", "xla")
    ref, _ = generate_streaming(model, params, states[:, :1], bc_mask, pos_ids, n_steps)
    monkeypatch.setenv("FLUID_QMM", "interpret")
    got, _ = generate_streaming(model, params, states[:, :1], bc_mask, pos_ids, n_steps)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=1e-2,
    )
