"""Weight-only quantization for the backbone (serving memory saver).

TPU-native equivalent of the reference's bitsandbytes 4-bit loading
(``src/models/model.py:51``, flag ``llm_4bit_loading``).  Two storage modes:

- ``nf4`` (default for the flag): QLoRA-style 4-bit NormalFloat — two codes
  packed per byte, per-64-weight absmax blocks, the absmax vector itself
  double-quantized to int8 per 256-block with a global mean offset (the
  bitsandbytes recipe).  ~0.55 bytes/weight for frozen backbones.
- ``int8``: per-output-column symmetric absmax (1 byte/weight).

Dequantisation happens on use inside jit; the matmul itself stays bf16 on
the MXU (XLA fuses the dequant arithmetic into the weight load, and the
16-entry nf4 codebook lookup is a tiny VPU gather).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# The QLoRA NF4 codebook: quantiles of N(0,1) normalised to [-1, 1]
# (Dettmers et al. 2023; identical to bitsandbytes' nf4 data type).
NF4_CODEBOOK = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

NF4_BLOCK = 64  # weights per absmax block (bitsandbytes default)
NF4_CHUNK = 256  # absmax values per double-quantization chunk


def quantize_weight(w: jnp.ndarray) -> Params:
    """(..., in, out) float -> {'q': int8 (..., in, out), 'scale': (..., out)
    f32} — per-output-column symmetric absmax.  Leading axes (e.g. the MoE
    expert stack's E) quantize independently per slice."""
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(qp: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qp["q"].astype(jnp.float32) * qp["scale"][..., None, :]).astype(dtype)


def quantize_weight_nf4(w: jnp.ndarray) -> Params:
    """(in, out) float -> packed nf4 storage.

    Layout: ``codes`` is (in, out//2) uint8, byte (i, j) packing columns
    (2j | low nibble) and (2j+1 | high nibble) — the original shape is
    statically recoverable from the codes shape, so dequant works under
    jit.  absmax blocks run over the row-major flattened weight.
    """
    d_in, d_out = w.shape
    assert d_out % 2 == 0, w.shape
    n = d_in * d_out
    assert n % NF4_BLOCK == 0, w.shape
    flat = np.asarray(w, np.float32).reshape(-1, NF4_BLOCK)
    absmax = np.abs(flat).max(axis=1)
    normed = flat / np.where(absmax > 0, absmax, 1.0)[:, None]
    # nearest codebook entry
    idx = np.abs(normed.reshape(-1, 1) - NF4_CODEBOOK[None, :]).argmin(axis=1)
    idx = idx.astype(np.uint8).reshape(d_in, d_out)
    codes = (idx[:, 0::2] | (idx[:, 1::2] << 4)).astype(np.uint8)

    # double-quantize the absmax vector: int8 per 256-chunk + global offset
    nb = absmax.shape[0]
    offset = absmax.mean(dtype=np.float64).astype(np.float32)
    centred = absmax - offset
    nbp = -(-nb // NF4_CHUNK) * NF4_CHUNK
    centred = np.pad(centred, (0, nbp - nb))
    chunks = centred.reshape(-1, NF4_CHUNK)
    cscale = np.abs(chunks).max(axis=1)
    cscale = np.where(cscale > 0, cscale / 127.0, 1.0).astype(np.float32)
    q8 = np.clip(np.round(chunks / cscale[:, None]), -127, 127).astype(np.int8)

    return {
        "codes": jnp.asarray(codes),
        "absmax_q": jnp.asarray(q8.reshape(-1)),
        "absmax_scale": jnp.asarray(cscale),
        "absmax_offset": jnp.asarray(offset),
    }


def dequantize_weight_nf4(qp: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    codes = qp["codes"]
    d_in, half = codes.shape
    d_out = half * 2
    n = d_in * d_out
    nb = n // NF4_BLOCK

    low = (codes & 0xF).astype(jnp.int32)
    high = (codes >> 4).astype(jnp.int32)
    idx = jnp.stack([low, high], axis=-1).reshape(d_in, d_out)
    vals = jnp.take(jnp.asarray(NF4_CODEBOOK), idx)

    absmax = (
        qp["absmax_q"].astype(jnp.float32).reshape(-1, NF4_CHUNK)
        * qp["absmax_scale"][:, None]
    ).reshape(-1)[:nb] + qp["absmax_offset"]
    w = (vals.reshape(-1, NF4_BLOCK) * absmax[:, None]).reshape(d_in, d_out)
    return w.astype(dtype)


def _is_linear_leaf(node) -> bool:
    return isinstance(node, dict) and "w" in node and not isinstance(node["w"], dict)


def quantize_backbone(backbone_params: Params, mode: str = "nf4") -> Params:
    """Quantize every linear weight matrix in the backbone tree; norms,
    biases and embeddings stay float.  mode: "nf4" (4-bit) | "int8"."""
    if mode not in ("nf4", "int8"):
        raise ValueError(mode)

    def quant(w):
        if mode == "int8":
            return quantize_weight(w)
        d_in, d_out = w.shape
        if d_out % 2 or (d_in * d_out) % NF4_BLOCK:
            return quantize_weight(w)  # shape not nf4-packable; int8 fallback
        return quantize_weight_nf4(w)

    def walk(node):
        if _is_linear_leaf(node) and node["w"].ndim == 2:
            out = dict(node)
            out["w"] = quant(node["w"])
            return out
        if _is_linear_leaf(node) and node["w"].ndim == 3:
            # stacked MoE expert bank (E, in, out): int8 per expert slice
            # (per-output-column scales generalise; nf4's flat block packing
            # does not — and the expert bank is exactly where the bytes are)
            out = dict(node)
            out["w"] = quantize_weight(node["w"])
            return out
        if isinstance(node, dict):
            # the MoE router stays float: routing computes in f32 (top-k
            # stability) and its (d, E) matrix is negligible
            return {k: (v if k == "router" else walk(v)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(backbone_params)


def dequantize_backbone(qparams: Params, dtype=jnp.bfloat16) -> Params:
    """Inverse of :func:`quantize_backbone` (materialises float weights)."""

    def walk(node):
        if isinstance(node, dict) and isinstance(node.get("w"), dict):
            out = dict(node)
            deq = dequantize_weight_nf4 if "codes" in node["w"] else dequantize_weight
            out["w"] = deq(node["w"], dtype)
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(qparams)


def quantization_error(backbone_params: Params) -> float:
    """Max relative reconstruction error over linear weights (diagnostics)."""
    errs = []

    def walk(node):
        if _is_linear_leaf(node) and node["w"].ndim == 2:
            qp = quantize_weight(node["w"])
            rec = dequantize_weight(qp, jnp.float32)
            denom = jnp.maximum(jnp.max(jnp.abs(node["w"])), 1e-12)
            errs.append(float(jnp.max(jnp.abs(rec - node["w"])) / denom))
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(backbone_params)
    return max(errs) if errs else 0.0
