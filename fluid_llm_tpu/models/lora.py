"""LoRA / DoRA parameter-efficient adapters for the backbone.

The reference wraps its HF backbone with peft
(``src/models/model.py:106-116``, config ``configs/training1.yaml:9-14`` —
DoRA r=16, alpha=64 on the attention q/v projections, peft's OPT default
target set).  Here adapters are a parallel params tree; the base backbone
weights stay frozen leaves and the effective weight is composed at apply
time:

    LoRA:  W_eff = W + (alpha/r) * A @ B          (A ~ kaiming, B = 0)
    DoRA:  W_eff = m * (W + dW) / ||W + dW||_col   (m init ||W||_col,
                                                    norm stop-gradiented)

``lora_dropout`` acts on the adapter-branch input during training, matching
peft's placement.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.config import LoraConfig

Params = dict[str, Any]

# peft target-module names -> our backbone param paths
_NAME_MAP = {
    "q_proj": ("attn", "q"),
    "k_proj": ("attn", "k"),
    "v_proj": ("attn", "v"),
    "o_proj": ("attn", "o"),
    "out_proj": ("attn", "o"),
    "fc1": ("mlp", "fc1"),
    "fc2": ("mlp", "fc2"),
    "gate_proj": ("mlp", "gate"),
    "up_proj": ("mlp", "up"),
    "down_proj": ("mlp", "down"),
}


def target_paths(cfg: LoraConfig) -> list[tuple[str, str]]:
    return [_NAME_MAP[t] for t in cfg.target_modules]


def init_lora(key: jax.Array, backbone_params: Params, cfg: LoraConfig) -> Params:
    """Build the adapter tree parallel to ``backbone_params['layers']``."""
    layers = backbone_params["layers"]
    keys = jax.random.split(key, len(layers))
    paths = target_paths(cfg)
    out_layers = []
    for li, layer in enumerate(layers):
        subkeys = jax.random.split(keys[li], len(paths))
        entry: Params = {}
        for (group, name), sk in zip(paths, subkeys):
            if name not in layer[group]:
                if group == "mlp" and "router" in layer[group]:
                    raise ValueError(
                        f"LoRA target {name!r} addresses the dense MLP, but "
                        "this is a MoE backbone (moe.experts > 0) — adapt "
                        "attention projections only, or train the expert "
                        "bank directly"
                    )
                raise KeyError(f"LoRA target {group}.{name} not in backbone")
            w = layer[group][name]["w"]
            d_in, d_out = w.shape
            # peft init: A kaiming_uniform(a=sqrt(5)) on (r, d_in) -> bound
            # sqrt(6/d_in)/sqrt(1+5) * sqrt(... ) simplifies to 1/sqrt(d_in)
            bound = 1.0 / math.sqrt(d_in)
            a = jax.random.uniform(sk, (d_in, cfg.r), jnp.float32, -bound, bound)
            leaf: Params = {"A": a, "B": jnp.zeros((cfg.r, d_out), jnp.float32)}
            if cfg.use_dora:
                leaf["m"] = jnp.linalg.norm(w, axis=0)  # per-output-column norm
            entry.setdefault(group, {})[name] = leaf
        out_layers.append(entry)
    return {"layers": out_layers}


def lora_linear(
    x: jnp.ndarray,
    base: Params,
    adapter: Optional[Params],
    cfg: Optional[LoraConfig],
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Linear layer with an optional LoRA/DoRA adapter."""
    from fluid_llm_tpu.models.backbone import materialize_w

    dtype = x.dtype
    w = materialize_w(base, dtype)
    b = base.get("b")
    if adapter is None:
        y = x @ w
        return y + b.astype(dtype) if b is not None else y

    scaling = cfg.lora_alpha / cfg.r
    a = adapter["A"].astype(dtype)
    bb = adapter["B"].astype(dtype)

    x_drop = x
    if train and cfg.lora_dropout > 0.0:
        if rng is None:
            raise ValueError("lora_dropout requires an rng")
        keep = jax.random.bernoulli(rng, 1.0 - cfg.lora_dropout, x.shape)
        x_drop = jnp.where(keep, x / (1.0 - cfg.lora_dropout), 0.0)

    delta_out = (x_drop @ a) @ bb * scaling
    base_out = x @ w

    if cfg.use_dora:
        # column norms of w_eff = w + A@B*scaling WITHOUT materialising the
        # (in, out) update (the naive form cost ~8% of the anchor train step —
        # measured via tools/train_profile):
        #   ||w_eff_j||^2 = ||w_j||^2 + 2s * <w_j, (AB)_j> + s^2 * ||(AB)_j||^2
        # where the cross term is one (out, r) gemm and the AB term is a tiny
        # r x r contraction.  Same value as norm(w + AB*s, axis=0) up to fp
        # reassociation; the whole expression is under stop_gradient, exactly
        # as the reference's weight-norm detach.
        w32 = materialize_w(base, jnp.float32)
        a32, b32 = adapter["A"].astype(jnp.float32), adapter["B"].astype(jnp.float32)
        wn2 = jnp.sum(w32 * w32, axis=0)  # (out,) — fused read+reduce, no temp
        cross = jnp.einsum("jr,rj->j", w32.T @ a32, b32)
        ab2 = jnp.einsum("rs,rj,sj->j", a32.T @ a32, b32, b32)
        norm = jax.lax.stop_gradient(
            jnp.sqrt(wn2 + 2.0 * scaling * cross + scaling**2 * ab2)
        )
        mag = (adapter["m"] / norm).astype(dtype)
        y = (base_out + delta_out) * mag
    else:
        y = base_out + delta_out
    if b is not None:
        y = y + b.astype(dtype)
    return y


def merge_lora(backbone_params: Params, lora_params: Params, cfg: LoraConfig) -> Params:
    """Fold adapters into the base weights (for export / fast inference)."""
    scaling = cfg.lora_alpha / cfg.r
    merged_layers = []
    for layer, adapters in zip(backbone_params["layers"], lora_params["layers"]):
        new_layer = jax.tree_util.tree_map(lambda v: v, layer)  # shallow copy
        for group, entries in adapters.items():
            for name, leaf in entries.items():
                w = layer[group][name]["w"]
                w_eff = w + leaf["A"] @ leaf["B"] * scaling
                if cfg.use_dora:
                    norm = jnp.linalg.norm(w_eff, axis=0)
                    w_eff = w_eff * (leaf["m"] / norm)
                new_layer[group][name] = dict(layer[group][name], w=w_eff)
        merged_layers.append(new_layer)
    return dict(backbone_params, layers=merged_layers)
