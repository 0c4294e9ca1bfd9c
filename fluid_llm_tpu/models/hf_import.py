"""HF checkpoint -> JAX backbone params conversion.

The reference loads pretrained backbones via ``AutoModel.from_pretrained``
(``src/models/model.py:46-55``) and pulls the BOS token embedding for the
trainable BOS parameter (``model.py:62-73``).  Here the torch state dict is
converted into the functional param tree of ``models/backbone.py``.

Random init is a fully supported mode (the default when no checkpoint is
cached — this environment has no network egress); pretrained import is a
drop-in upgrade.  Conversion is unit-tested against HF *random* models built
from config (no download needed) with forward-parity checks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.models.backbone import BackboneConfig, preset

Params = dict[str, Any]

# BOS token ids per family (tokenizer download not required)
BOS_IDS = {"opt": 2, "gpt2": 50256, "llama": 1}


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().float().numpy(), dtype=np.float32)


def convert_state_dict(sd: dict, cfg: BackboneConfig) -> tuple[Params, np.ndarray]:
    """torch state dict -> (backbone params, token embedding table).

    The token table is None when absent from ``sd`` — dicts produced by
    ``tools.reference_ckpt.export_state_dict`` omit the frozen HF embed
    tables our tree never carries (``load_pretrained`` always has them)."""
    if cfg.family == "opt":
        return _convert_opt(sd, cfg)
    if cfg.family == "gpt2":
        return _convert_gpt2(sd, cfg)
    if cfg.family == "llama":
        return _convert_llama(sd, cfg)
    raise ValueError(cfg.family)


def _strip(sd: dict, prefix: str) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v
    return out


def _convert_opt(sd: dict, cfg: BackboneConfig) -> tuple[Params, np.ndarray]:
    sd = _strip(sd, "model.")
    p = "decoder."

    def lin(name):
        return {"w": _t(sd[f"{name}.weight"]).T, "b": _t(sd[f"{name}.bias"])}

    def ln(name):
        return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}

    layers = []
    for i in range(cfg.n_layers):
        L = f"{p}layers.{i}."
        layers.append(
            {
                "ln1": ln(L + "self_attn_layer_norm"),
                "attn": {
                    "q": lin(L + "self_attn.q_proj"),
                    "k": lin(L + "self_attn.k_proj"),
                    "v": lin(L + "self_attn.v_proj"),
                    "o": lin(L + "self_attn.out_proj"),
                },
                "ln2": ln(L + "final_layer_norm"),
                "mlp": {"fc1": lin(L + "fc1"), "fc2": lin(L + "fc2")},
            }
        )
    params: Params = {
        "layers": layers,
        # OPT's learned positions already include the +2 offset rows
        "pos_embed": _t(sd[p + "embed_positions.weight"]),
    }
    # OPT-350m: no final layer norm (do_layer_norm_before=False), and
    # project_in/project_out around the decoder (word_embed_proj_dim=512)
    if cfg.final_ln:
        params["final_norm"] = ln(p + "final_layer_norm")
    if f"{p}project_in.weight" in sd:
        params["project_in"] = {"w": _t(sd[p + "project_in.weight"]).T}
        params["project_out"] = {"w": _t(sd[p + "project_out.weight"]).T}
    key = p + "embed_tokens.weight"
    return params, (_t(sd[key]) if key in sd else None)


def _convert_gpt2(sd: dict, cfg: BackboneConfig) -> tuple[Params, np.ndarray]:
    sd = _strip(sd, "")

    def ln(name):
        return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}

    layers = []
    d = cfg.d_model
    for i in range(cfg.n_layers):
        L = f"h.{i}."
        # GPT-2 Conv1D stores (in, out): no transpose; c_attn packs q|k|v
        c_attn_w = _t(sd[L + "attn.c_attn.weight"])
        c_attn_b = _t(sd[L + "attn.c_attn.bias"])
        qw, kw, vw = np.split(c_attn_w, 3, axis=1)
        qb, kb, vb = np.split(c_attn_b, 3, axis=0)
        layers.append(
            {
                "ln1": ln(L + "ln_1"),
                "attn": {
                    "q": {"w": qw, "b": qb},
                    "k": {"w": kw, "b": kb},
                    "v": {"w": vw, "b": vb},
                    "o": {"w": _t(sd[L + "attn.c_proj.weight"]), "b": _t(sd[L + "attn.c_proj.bias"])},
                },
                "ln2": ln(L + "ln_2"),
                "mlp": {
                    "fc1": {"w": _t(sd[L + "mlp.c_fc.weight"]), "b": _t(sd[L + "mlp.c_fc.bias"])},
                    "fc2": {"w": _t(sd[L + "mlp.c_proj.weight"]), "b": _t(sd[L + "mlp.c_proj.bias"])},
                },
            }
        )
    params: Params = {
        "layers": layers,
        "final_norm": ln("ln_f"),
        "pos_embed": _t(sd["wpe.weight"]),
    }
    return params, (_t(sd["wte.weight"]) if "wte.weight" in sd else None)


def _convert_llama(sd: dict, cfg: BackboneConfig) -> tuple[Params, np.ndarray]:
    sd = _strip(sd, "model.")

    def lin(name):
        return {"w": _t(sd[f"{name}.weight"]).T}

    layers = []
    for i in range(cfg.n_layers):
        L = f"layers.{i}."
        layers.append(
            {
                "ln1": {"scale": _t(sd[L + "input_layernorm.weight"])},
                "attn": {
                    "q": lin(L + "self_attn.q_proj"),
                    "k": lin(L + "self_attn.k_proj"),
                    "v": lin(L + "self_attn.v_proj"),
                    "o": lin(L + "self_attn.o_proj"),
                },
                "ln2": {"scale": _t(sd[L + "post_attention_layernorm.weight"])},
                "mlp": {
                    "gate": lin(L + "mlp.gate_proj"),
                    "up": lin(L + "mlp.up_proj"),
                    "down": lin(L + "mlp.down_proj"),
                },
            }
        )
    params: Params = {"layers": layers, "final_norm": {"scale": _t(sd["norm.weight"])}}
    return params, (_t(sd["embed_tokens.weight"])
                    if "embed_tokens.weight" in sd else None)


def load_pretrained(
    name: str, llm_layers: int = -1, local_files_only: bool = True
) -> Optional[tuple[Params, np.ndarray, BackboneConfig]]:
    """Load + convert a pretrained backbone from the local HF cache.

    Returns None when transformers or the cached weights are unavailable
    (random init then applies, the supported fallback).
    """
    cfg = preset(name, llm_layers)
    try:
        import os

        if local_files_only:
            # zero-egress environment: stop huggingface_hub from retrying
            # network HEAD requests before falling back to the cache
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        import torch  # noqa: F401
        from transformers import AutoModel

        model = AutoModel.from_pretrained(name, local_files_only=local_files_only)
    except Exception:
        return None
    params, embed_tokens = convert_state_dict(model.state_dict(), cfg)
    assert embed_tokens is not None  # a real HF model always carries it
    return params, embed_tokens, cfg


def bos_embedding(embed_tokens: np.ndarray, cfg: BackboneConfig) -> jnp.ndarray:
    """The pretrained BOS embedding used to init the trainable BOS param
    (``model.py:70-73``)."""
    return jnp.asarray(embed_tokens[BOS_IDS[cfg.family]])
