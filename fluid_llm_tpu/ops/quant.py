"""Weight-only int8 quantization for the backbone (serving memory saver).

TPU-native stand-in for the reference's bitsandbytes 4-bit loading
(``src/models/model.py:51``, flag ``llm_4bit_loading``): linear weights are
stored as int8 with per-output-column float scales (symmetric absmax), and
dequantised on use.  Halves-to-quarters HBM for frozen backbones; the
matmul itself stays bf16 on the MXU (XLA fuses the dequant multiply into
the weight load).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def quantize_weight(w: jnp.ndarray) -> Params:
    """(in, out) float -> {'q': int8 (in, out), 'scale': (out,) f32}."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(qp: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qp["q"].astype(jnp.float32) * qp["scale"]).astype(dtype)


def _is_linear_leaf(node) -> bool:
    return isinstance(node, dict) and "w" in node and not isinstance(node["w"], dict)


def quantize_backbone(backbone_params: Params) -> Params:
    """Quantize every linear weight matrix in the backbone tree; norms,
    biases and embeddings stay float."""

    def walk(node):
        if _is_linear_leaf(node) and node["w"].ndim == 2:
            out = dict(node)
            out["w"] = quantize_weight(node["w"])
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(backbone_params)


def dequantize_backbone(qparams: Params, dtype=jnp.bfloat16) -> Params:
    """Inverse of :func:`quantize_backbone` (materialises float weights)."""

    def walk(node):
        if isinstance(node, dict) and isinstance(node.get("w"), dict):
            out = dict(node)
            out["w"] = dequantize_weight(node["w"], dtype)
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
