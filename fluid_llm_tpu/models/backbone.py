"""Decoder-only transformer backbone (OPT / GPT-2 / LLaMA layouts), functional JAX.

Replaces the HF ``AutoModel`` backbone of the reference
(``src/models/model.py:46-55``).  The reference feeds pre-computed patch
embeddings via ``inputs_embeds`` (token embeddings nulled through
``PassthroughEmbeddings``, ``model.py:102-104``) — so the backbone here takes
embeddings directly and has no token-embedding table in its forward path.

Fidelity notes:
- OPT/GPT-2 still add their own learned 1-D positional embedding on top of
  ``inputs_embeds`` (HF ``OPTDecoder``/``GPT2Model`` behaviour the reference
  inherits); ``pos="learned"`` reproduces that, with OPT's offset-2 indexing.
- Positions are computed as ``cumsum(valid)-1`` over the validity mask, which
  equals ``arange(L)`` for dense inputs (the only case the reference hits) and
  stays correct for the left-padded rollout windows used by the TPU scan.
- Layer truncation (``llm_layers``, ``model.py:37-39``) is just ``n_layers``.

Everything is a pure function over a params pytree, so pjit sharding,
LoRA/DoRA wrapping, and HF weight import are plain tree operations.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclass(frozen=True)
class BackboneConfig:
    family: str  # "opt" | "gpt2" | "llama"
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    n_kv_heads: Optional[int] = None  # GQA; None -> n_heads
    max_pos: int = 2048
    vocab_size: int = 50272
    # OPT-350m quirks (HF ``OPTConfig``): embeddings live at
    # ``word_embed_proj_dim`` with project_in/project_out around the decoder,
    # blocks are post-LN (``do_layer_norm_before=False``) and there is no
    # final layer norm.  The reference's own 350m path would shape-error in
    # HF (it sizes the patch encoder by ``hidden_size``,
    # ``src/models/model.py:44``, but OPT-350m's ``project_in`` expects
    # 512-dim ``inputs_embeds``) — implemented here faithfully to HF instead.
    d_embed: Optional[int] = None  # word_embed_proj_dim; None -> d_model
    pre_ln: bool = True  # do_layer_norm_before
    final_ln: bool = True
    act: str = "relu"  # "relu" | "gelu_new" | "silu"
    norm: str = "layernorm"  # "layernorm" | "rmsnorm"
    pos: str = "learned"  # "learned" | "rope"
    pos_offset: int = 0  # OPT uses 2
    rope_theta: float = 10000.0
    ln_eps: float = 1e-5
    dropout: float = 0.1
    attn_impl: str = "auto"  # "auto" | "xla" | "flash"
    dtype: Any = jnp.float32  # activation dtype (bf16 for parity with ref)
    remat: bool = False  # rematerialise each block (jax.checkpoint)
    # Mixture-of-experts MLP (TPU-native addition, no reference equivalent —
    # upstream backbones are all dense).  0 = dense.  When > 0 every block's
    # MLP becomes `moe_experts` expert FFNs behind a top-k router with
    # per-sequence capacity `ceil(top_k * L * capacity_factor / E)`; expert
    # weights carry a leading E axis shardable over an "expert" mesh axis
    # (see parallel/mesh.py) — dispatch/combine einsums let GSPMD insert the
    # all-to-alls.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_router: str = "topk"  # "topk" (Switch/GShard) | "expert_choice"
    #   expert_choice (Zhou et al. 2022): each expert picks its top-C tokens
    #   — capacity-exact by construction (every expert bank runs full, no
    #   drops, no balance loss), the most static-shape/TPU-friendly routing

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def embed_dim(self) -> int:
        """The dim of ``inputs_embeds`` and of the backbone output."""
        return self.d_embed or self.d_model

    def replace(self, **kw) -> "BackboneConfig":
        return dataclasses.replace(self, **kw)


# Known HF layouts used by the reference (``configs/training1.yaml:4``,
# ``src/models/model.py:35-36``).  Truncate with ``n_layers`` as needed.
PRESETS: dict[str, BackboneConfig] = {
    "facebook/opt-125m": BackboneConfig(
        family="opt", n_layers=12, d_model=768, n_heads=12, d_ff=3072,
        act="relu", norm="layernorm", pos="learned", pos_offset=2,
        max_pos=2048, vocab_size=50272,
    ),
    "facebook/opt-350m": BackboneConfig(
        family="opt", n_layers=24, d_model=1024, n_heads=16, d_ff=4096,
        act="relu", norm="layernorm", pos="learned", pos_offset=2,
        max_pos=2048, vocab_size=50272,
        d_embed=512, pre_ln=False, final_ln=False,
    ),
    "facebook/opt-2.7b": BackboneConfig(
        family="opt", n_layers=32, d_model=2560, n_heads=32, d_ff=10240,
        act="relu", norm="layernorm", pos="learned", pos_offset=2,
        max_pos=2048, vocab_size=50272,
    ),
    "openai-community/gpt2": BackboneConfig(
        family="gpt2", n_layers=12, d_model=768, n_heads=12, d_ff=3072,
        act="gelu_new", norm="layernorm", pos="learned",
        max_pos=1024, vocab_size=50257,
    ),
    "gpt2": BackboneConfig(
        family="gpt2", n_layers=12, d_model=768, n_heads=12, d_ff=3072,
        act="gelu_new", norm="layernorm", pos="learned",
        max_pos=1024, vocab_size=50257,
    ),
    "huggyllama/llama-7b": BackboneConfig(
        family="llama", n_layers=32, d_model=4096, n_heads=32, d_ff=11008,
        act="silu", norm="rmsnorm", pos="rope", ln_eps=1e-6,
        max_pos=2048, vocab_size=32000, dropout=0.0,
    ),
    # TPU-native addition (no HF counterpart): an OPT-125m-scale llama-style
    # backbone.  Rotary positions make it compatible with the streaming
    # KV-cache serving path (``rollout/streaming.py``), which learned
    # absolute positions (OPT/GPT-2) structurally cannot support.
    "fluid/llama-125m": BackboneConfig(
        family="llama", n_layers=12, d_model=768, n_heads=12, d_ff=2048,
        act="silu", norm="rmsnorm", pos="rope", ln_eps=1e-6,
        max_pos=32768, vocab_size=32000, dropout=0.0,
    ),
    # OPT-350m geometry with rotary positions (24L x d1024; gated-SiLU FFN
    # sized to OPT's 4096 FFN FLOPs) — the streaming-serving counterpart of
    # the reference's "large" tier (``src/models/model.py:35-36``), which
    # learned absolute positions (OPT) structurally cannot serve.
    "fluid/llama-350m": BackboneConfig(
        family="llama", n_layers=24, d_model=1024, n_heads=16, d_ff=2816,
        act="silu", norm="rmsnorm", pos="rope", ln_eps=1e-6,
        max_pos=32768, vocab_size=32000, dropout=0.0,
    ),
}


def preset(name: str, llm_layers: int = -1, **overrides) -> BackboneConfig:
    """Resolve a backbone name + optional layer truncation (``model.py:37-39``)."""
    if name not in PRESETS:
        raise ValueError(f"Unknown backbone {name!r}; known: {sorted(PRESETS)}")
    cfg = PRESETS[name]
    if llm_layers > cfg.n_layers:
        raise ValueError(
            f"Requested number of layers ({llm_layers}) is greater than the "
            f"model's ({cfg.n_layers})!"
        )
    if llm_layers > 0:
        cfg = cfg.replace(n_layers=llm_layers)
    return cfg.replace(**overrides) if overrides else cfg


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, std=0.02, bias=True):
    wk, _ = jax.random.split(key)
    p = {"w": jax.random.normal(wk, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _norm_init(d, bias=True):
    p = {"scale": jnp.ones((d,), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((d,), jnp.float32)
    return p


def _moe_init(key: jax.Array, cfg: BackboneConfig) -> Params:
    """One MoE MLP: router + E stacked expert FFNs (leading axis = expert,
    shardable over the "expert" mesh axis)."""
    E, d, ff = cfg.moe_experts, cfg.d_model, cfg.d_ff
    kr, k1, k2, k3 = jax.random.split(key, 4)

    def stacked(k, d_in, d_out, bias):
        p = {"w": jax.random.normal(k, (E, d_in, d_out), jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros((E, d_out), jnp.float32)
        return p

    if cfg.family == "llama":
        experts = {
            "gate": stacked(k1, d, ff, bias=False),
            "up": stacked(k2, d, ff, bias=False),
            "down": stacked(k3, ff, d, bias=False),
        }
    else:
        experts = {
            "fc1": stacked(k1, d, ff, bias=True),
            "fc2": stacked(k2, ff, d, bias=True),
        }
    return {"router": _linear_init(kr, d, E, bias=False), "experts": experts}


def init_params(key: jax.Array, cfg: BackboneConfig) -> Params:
    keys = jax.random.split(key, cfg.n_layers + 2)
    has_bias = cfg.family != "llama"
    d, ff = cfg.d_model, cfg.d_ff
    kv_dim = cfg.kv_heads * cfg.head_dim

    layers = []
    for li in range(cfg.n_layers):
        k = jax.random.split(keys[li], 8)
        attn = {
            "q": _linear_init(k[0], d, d, bias=has_bias),
            "k": _linear_init(k[1], d, kv_dim, bias=has_bias),
            "v": _linear_init(k[2], d, kv_dim, bias=has_bias),
            "o": _linear_init(k[3], d, d, bias=has_bias),
        }
        if cfg.moe_experts > 0:
            mlp = _moe_init(k[4], cfg)
        elif cfg.family == "llama":
            mlp = {
                "gate": _linear_init(k[4], d, ff, bias=False),
                "up": _linear_init(k[5], d, ff, bias=False),
                "down": _linear_init(k[6], ff, d, bias=False),
            }
        else:
            mlp = {
                "fc1": _linear_init(k[4], d, ff),
                "fc2": _linear_init(k[5], ff, d),
            }
        layers.append(
            {
                "ln1": _norm_init(d, bias=has_bias),
                "attn": attn,
                "ln2": _norm_init(d, bias=has_bias),
                "mlp": mlp,
            }
        )

    params: Params = {"layers": layers}
    if cfg.final_ln:
        params["final_norm"] = _norm_init(d, bias=has_bias)
    if cfg.d_embed is not None and cfg.d_embed != d:
        # HF OPT project_in/project_out (no bias)
        kp_in, kp_out = jax.random.split(keys[-2])
        params["project_in"] = _linear_init(kp_in, cfg.d_embed, d, bias=False)
        params["project_out"] = _linear_init(kp_out, d, cfg.d_embed, bias=False)
    if cfg.pos == "learned":
        params["pos_embed"] = (
            jax.random.normal(keys[-1], (cfg.max_pos + cfg.pos_offset, d), jnp.float32) * 0.02
        )
    return params


def cast_matmul_params(params: Params, dtype) -> Params:
    """Inference-time dtype transform: store each layer's matmul weights in
    the activation dtype (bf16) so the per-use ``w.astype`` is a no-op.

    Exact for inference — ``_linear`` casts to the activation dtype before
    every matmul anyway; doing it once at prepare time halves the weight
    bytes read per step and (with ``stack_layers``) keeps the layer-scan
    from re-converting a dynamically-sliced f32 buffer every block.  Norm
    params stay f32 (``_norm`` computes in f32).
    """

    def cast_group(group):
        out = {}
        for name, p in group.items():
            if name == "router":
                out[name] = p  # routing logits compute in f32; keep weights f32
            elif name == "experts":
                out[name] = cast_group(p)  # stacked (E, ...) expert weights
            elif isinstance(p, dict) and "w" in p and not isinstance(p["w"], dict):
                q = dict(p, w=p["w"].astype(dtype))
                if "b" in q:
                    q["b"] = q["b"].astype(dtype)
                out[name] = q
            else:
                out[name] = p
        return out

    layers = []
    for layer in params["layers"]:
        layers.append(
            {
                k: (cast_group(v) if k in ("attn", "mlp") else v)
                for k, v in layer.items()
            }
        )
    out = dict(params, layers=layers)
    for k in ("project_in", "project_out"):
        if k in out:
            out[k] = dict(out[k], w=out[k]["w"].astype(dtype))
    return out


def stack_layers(params: Params) -> Params:
    """Inference-time layout transform: the per-layer param LIST becomes one
    pytree whose leaves carry a leading ``n_layers`` axis.

    ``apply``/``apply_streaming`` detect the stacked layout and run a
    ``lax.scan`` over blocks instead of unrolling them in python — the rollout
    program body shrinks ~n_layers×, which is what cold XLA compiles pay for
    (the 251-step rollout traces the backbone inside its step scan).  Exact:
    the per-iteration slice is the same layer pytree the loop indexed.
    Layers must be homogeneous (same treedef — true per family, after
    ``pack_qkv_params``, and for uniformly-quantized layers); heterogeneous
    lists are left unstacked and keep the unrolled path.
    """
    layers = params["layers"]
    if not isinstance(layers, list):
        return params
    if any("router" in l.get("mlp", {}) for l in layers):
        # MoE expert weights already carry a leading (E, ...) axis that the
        # stacked-scan block indexers don't understand — keep unrolled
        return params
    td0 = jax.tree_util.tree_structure(layers[0])
    shapes0 = [jnp.shape(l) for l in jax.tree_util.tree_leaves(layers[0])]
    for layer in layers[1:]:
        if jax.tree_util.tree_structure(layer) != td0:
            return params
        if [jnp.shape(l) for l in jax.tree_util.tree_leaves(layer)] != shapes0:
            return params
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return dict(params, layers=stacked)


def unstack_layers(params: Params) -> Params:
    """Inverse of :func:`stack_layers`: split the leading ``n_layers`` axis
    back into a per-layer list (no-op on the list layout).  Needed by the
    inference-time weight transforms (``pack_qkv_params``,
    ``cast_matmul_params``, quantization), which operate on the list layout
    — e.g. when preparing a pipeline-trained checkpoint for serving."""
    layers = params["layers"]
    if isinstance(layers, list):
        return params
    n = jax.tree_util.tree_leaves(layers)[0].shape[0]
    out = [
        jax.tree_util.tree_map(lambda x: x[i], layers) for i in range(n)
    ]
    return dict(params, layers=out)


def pack_qkv_params(params: Params) -> Params:
    """Inference-time weight transform: fuse each layer's q/k/v projections
    into one ``(d, d + 2*kv_dim)`` matmul.

    Exact (same math, one MXU pass instead of three small ones) — at the
    reference rollout's 661x768 gemms the per-dispatch overhead is a
    measurable share of the step.  Apply AFTER ``merge_lora`` (adapters
    target the unpacked names); quantised leaves are left unpacked.
    """
    layers = []
    for layer in params["layers"]:
        attn = layer["attn"]
        names = ("q", "k", "v")
        if not all(n in attn and not isinstance(attn[n]["w"], dict) for n in names):
            layers.append(layer)
            continue
        qkv = {"w": jnp.concatenate([attn[n]["w"] for n in names], axis=1)}
        if "b" in attn["q"]:
            qkv["b"] = jnp.concatenate([attn[n]["b"] for n in names])
        layers.append(dict(layer, attn={"qkv": qkv, "o": attn["o"]}))
    return dict(params, layers=layers)


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------


def _norm(x, p, cfg: BackboneConfig):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    if cfg.norm == "rmsnorm":
        x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + cfg.ln_eps)
        out = x * p["scale"]
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mu) * jax.lax.rsqrt(var + cfg.ln_eps) * p["scale"] + p["bias"]
    return out.astype(dtype)


def materialize_w(p, dtype):
    """Weight matrix of a linear param leaf; dequantises nf4/int8 storage
    (``ops/quant.py``) on the fly."""
    w = p["w"]
    if isinstance(w, dict):
        if "codes" in w:  # packed 4-bit NormalFloat
            from fluid_llm_tpu.ops.quant import dequantize_weight_nf4

            return dequantize_weight_nf4(w, dtype)
        # int8: per-output-column scales; [..., None, :] broadcasts over both
        # 2-D linears and stacked (E, in, out) MoE expert banks
        return (w["q"].astype(jnp.float32) * w["scale"][..., None, :]).astype(dtype)
    return w.astype(dtype)


def _linear(x, p):
    w = p["w"]
    if isinstance(w, dict) and "q" in w and w["q"].ndim == 2:
        # int8 storage: Pallas kernel keeps the int8 bytes as the ONLY
        # weight HBM reads (XLA materialises the dequantised bf16 copy;
        # ops/quant_matmul.py) — the serving win behind `--quant int8`
        from fluid_llm_tpu.ops import quant_matmul as _qmm

        use, interp = _qmm.use_kernel(*w["q"].shape)
        if use:
            y = _qmm.int8_matmul(x, w["q"], w["scale"], interp, _qmm.act_mode())
            if "b" in p:
                y = y + p["b"].astype(y.dtype)
            return y
    y = x @ materialize_w(p, x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _act(x, name):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "gelu_new":
        return jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(name)


def _moe_mlp(h, p, cfg: BackboneConfig, shardings=None, valid=None,
             capacity_tokens=None):
    """Top-k routed mixture-of-experts MLP, dense-dispatch formulation.

    Static shapes throughout (the TPU requirement): routing produces
    dispatch/combine tensors (bs, L, E, C) built from one-hots + a cumsum
    position-in-expert, and the expert FFNs run as batched einsums over
    stacked (E, ...) weights.  Tokens beyond an expert's capacity
    ``C = ceil(top_k * L * capacity_factor / E)`` are dropped (their MLP
    branch contributes zero — the residual stream carries them, standard
    Switch behaviour).  With the expert weights sharded P("expert", ...) the
    dispatch/combine einsums are where GSPMD inserts the all-to-alls.

    Returns ``(out, aux)`` — aux is the Switch load-balance loss
    (E · Σ_e fraction_e · mean-prob_e; 1.0 at uniform routing), added to the
    training loss by the trainer with ``cfg.moe.aux_weight``.

    ``moe_router="expert_choice"`` (Zhou et al. 2022, arXiv:2202.09368)
    inverts the selection: each EXPERT takes its top-C tokens by router
    affinity.  Every expert bank runs exactly full — no dropped-slot waste,
    no balance loss needed (aux returns 0), perfectly static shapes: the
    TPU-native routing.  A token may be picked by several or no experts
    (the residual stream carries unpicked tokens).  Downstream of the
    dispatch/combine construction the two routers share every einsum.
    """
    bs, L, d = h.shape
    E, top_k = cfg.moe_experts, cfg.moe_top_k
    # ``capacity_tokens``: static pre-padding token count — padding must not
    # inflate C, or padded and unpadded runs drop different tokens at tight
    # capacity (exactness contract of ring/FLUID_PAD_TOKENS padding)
    C = max(1, math.ceil(
        cfg.moe_capacity_factor * top_k * (capacity_tokens or L) / E
    ))

    # routing in f32 (softmax/cumsum precision)
    logits = jnp.einsum(
        "bld,de->ble", h.astype(jnp.float32), p["router"]["w"].astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1)
    # INVALID tokens (front-of-window slots, FLUID_PAD_TOKENS / ring padding)
    # must not route: they would consume expert capacity ahead of real
    # tokens (topk cumsum runs in token order) or displace them from an
    # expert's top-C (expert_choice), making real tokens' outputs depend on
    # padding — breaking the padding-exactness contract — and polluting the
    # balance-loss statistics.  Zeroing their probs removes them from slot
    # assignment/selection and zeroes their gates (outputs unused anyway).
    valid_f = None
    if valid is not None:
        valid_f = valid.astype(jnp.float32)[:, :, None]  # (bs, L, 1)
        probs = probs * valid_f

    if cfg.moe_router == "expert_choice":
        # experts pick tokens: top-C of each expert's affinity column
        # (an expert cannot take more tokens than the sequence holds)
        C = min(C, L)
        gates, idx = jax.lax.top_k(jnp.swapaxes(probs, 1, 2), C)  # (bs, E, C)
        sel = jax.nn.one_hot(idx, L, dtype=jnp.float32)  # (bs, E, C, L)
        dispatch = jnp.transpose(sel, (0, 3, 1, 2))  # (bs, L, E, C)
        combine = dispatch * gates[:, None]  # broadcast over L
        aux = jnp.zeros((), jnp.float32)  # balanced by construction
    else:
        sel_oh, sel_p = [], []
        remaining = probs
        for _ in range(top_k):
            idx = jnp.argmax(remaining, axis=-1)
            oh = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (bs, L, E)
            if valid_f is not None:
                oh = oh * valid_f  # invalid tokens take no capacity slot
            sel_oh.append(oh)
            sel_p.append(jnp.sum(probs * oh, axis=-1))  # (bs, L)
            remaining = remaining * (1.0 - oh)
        # top-1 keeps the raw router prob as the gate (Switch — the prob
        # factor is what carries router gradients); top-k>1 renormalises
        # over the selected experts (GShard/Mixtral — gates sum to 1)
        denom = jnp.maximum(sum(sel_p), 1e-9) if top_k > 1 else jnp.ones(())

        dispatch = jnp.zeros((bs, L, E, C), jnp.float32)
        combine = jnp.zeros((bs, L, E, C), jnp.float32)
        prev = jnp.zeros((bs, 1, E), jnp.float32)  # slots taken by earlier choices
        for i in range(top_k):
            oh = sel_oh[i]
            pos = jnp.cumsum(oh, axis=1) - oh + prev  # (bs, L, E)
            prev = prev + jnp.sum(oh, axis=1, keepdims=True)
            keep = oh * (pos < C)
            slot = jax.nn.one_hot(
                jnp.minimum(pos, C - 1).astype(jnp.int32), C, dtype=jnp.float32
            ) * keep[..., None]  # (bs, L, E, C)
            dispatch = dispatch + slot
            combine = combine + slot * (sel_p[i] / denom)[:, :, None, None]

    # ``shardings`` (optional pair built by FluidLLM.forward when
    # parallel.expert_axis > 1): [0] pins the per-expert tensors to
    # P("expert", ...) — the constraint that turns the dispatch einsum into
    # a token→expert all-to-all with each device running ONLY its local
    # expert bank (without it GSPMD keeps the batch sharding and all-gathers
    # every layer's expert weights: measured 44 GiB of temps at the
    # 8×7B-geometry dryrun vs ~1 GiB with the constraint); [1] returns the
    # combined output to the batch sharding.
    _ep = (lambda t: jax.lax.with_sharding_constraint(t, shardings[0])) \
        if shardings else (lambda t: t)
    xin = _ep(jnp.einsum("bld,blec->ebcd", h, dispatch.astype(h.dtype)))
    ex = p["experts"]

    def w(name):
        return materialize_w(ex[name], h.dtype)

    def badd(name, y):
        b = ex[name].get("b")
        return y if b is None else y + b.astype(y.dtype)[:, None, None, :]

    if "gate" in ex:
        y = jax.nn.silu(jnp.einsum("ebcd,edf->ebcf", xin, w("gate")))
        y = y * jnp.einsum("ebcd,edf->ebcf", xin, w("up"))
        out = _ep(jnp.einsum("ebcf,efd->ebcd", y, w("down")))
    else:
        y = _act(badd("fc1", jnp.einsum("ebcd,edf->ebcf", xin, w("fc1"))), cfg.act)
        out = _ep(badd("fc2", jnp.einsum("ebcf,efd->ebcd", y, w("fc2"))))
    out = jnp.einsum("ebcd,blec->bld", out, combine.astype(out.dtype))
    if shardings:
        out = jax.lax.with_sharding_constraint(out, shardings[1])

    if cfg.moe_router != "expert_choice":
        if valid_f is None:
            frac = jnp.mean(sel_oh[0], axis=1)  # fraction 1st-routed per expert
            pbar = jnp.mean(probs, axis=1)
        else:
            n_valid = jnp.maximum(jnp.sum(valid_f, axis=1), 1.0)  # (bs, 1)
            frac = jnp.sum(sel_oh[0], axis=1) / n_valid
            pbar = jnp.sum(probs, axis=1) / n_valid
        aux = jnp.mean(E * jnp.sum(frac * pbar, axis=-1))
    return out.astype(h.dtype), aux


def _rope(q, k, positions, cfg: BackboneConfig):
    """LLaMA rotary embedding: rotate (q, k) by per-position angles."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (bs, L, hd/2)
    cos = jnp.cos(angles)[:, :, None, :]  # (bs, L, 1, hd/2)
    sin = jnp.sin(angles)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return out.astype(x.dtype)

    return rot(q), rot(k)


def _attention_xla(q, k, v, allowed, dtype):
    """Reference-path scaled dot-product attention with a boolean mask.

    q/k/v: (bs, L, H, hd); allowed: (bs, 1, Lq, Lk) or (1, 1, Lq, Lk).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(allowed, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def make_masks(valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build (positions, allowed) from a per-token validity mask.

    valid: (bs, L) bool.  positions: (bs, L) int32 = cumsum(valid)-1 (clipped
    at 0), matching HF OPT's attention-mask-based position ids.  allowed:
    (bs, 1, L, L) bool = causal AND key-valid, with the diagonal forced on so
    invalid-query rows still have one finite logit (their outputs are unused).
    """
    bs, L = valid.shape
    positions = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1, 0)
    causal = jnp.tril(jnp.ones((L, L), bool))
    allowed = causal[None, :, :] & valid[:, None, :]
    eye = jnp.eye(L, dtype=bool)
    allowed = allowed | eye[None, :, :]
    return positions, allowed[:, None, :, :]


def _scan_unroll() -> int:
    """Unroll factor for the layer scans (``FLUID_SCAN_UNROLL``, default 1).

    The scanned-layer loop costs ~20-25 µs/iteration of loop overhead on
    this platform; unrolling k blocks per iteration divides that by k while
    keeping the program ~n_layers/k× smaller than the fully unrolled path.
    """
    import os

    return max(1, int(os.environ.get("FLUID_SCAN_UNROLL", "1")))


def _index_tree(tree, li):
    """Per-layer slice of small stacked leaves (norm scales etc.)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, False), tree
    )


def _stacked_linear(h, p, li, kernel_ok=True):
    """Linear against stacked ``(n_layers, K, N)`` weights at traced ``li``.

    Routes to the Pallas indexed-linear kernel on TPU (reads only layer
    ``li``'s bytes from the stacked HBM buffer — no dynamic-slice copy);
    quantised or non-lane-aligned leaves fall back to slice + ``_linear``.
    ``kernel_ok=False`` forces the XLA dynamic-slice formulation — required
    on GRADIENT-BEARING paths (the kernel is forward-only by design).
    ``_block_stacked`` always passes False: gradients can reach it both
    through the pipeline and through ``apply``'s stacked scan (a notf-mode
    rollout over a pipeline model differentiates the same code).  Only the
    streaming decode scan — inference by construction — keeps the kernel.
    """
    if isinstance(p.get("w"), dict):
        return _linear(h, _index_tree(p, li))
    from fluid_llm_tpu.ops.indexed_linear import _xla_indexed_linear, indexed_linear

    if not kernel_ok:
        lead = h.shape[:-1]
        out = _xla_indexed_linear(h.reshape(-1, h.shape[-1]), p["w"], p.get("b"), li)
        return out.reshape(*lead, p["w"].shape[-1])
    return indexed_linear(h, p["w"], p.get("b"), li)


def _block_stacked(x, lys, li, cfg: BackboneConfig, positions, allowed, valid):
    """One transformer block over stacked layer params at traced layer ``li``.

    LoRA- and dropout-free twin of ``block`` inside ``apply``: both the
    pipeline's tick scan and ``apply``'s stacked scan run (and may
    DIFFERENTIATE) this, so every stacked linear uses the XLA dynamic-slice
    formulation — the Pallas indexed-linear kernel is forward-only and is
    used by the streaming decode scan exclusively.
    """
    _sl = partial(_stacked_linear, kernel_ok=False)
    bs, L = x.shape[:2]
    d = cfg.d_model
    kv_dim = cfg.kv_heads * cfg.head_dim
    h = _norm(x, _index_tree(lys["ln1"], li), cfg) if cfg.pre_ln else x
    attn = lys["attn"]
    if "qkv" in attn:
        qkv = _sl(h, attn["qkv"], li)
        q, k, v = qkv[..., :d], qkv[..., d:d + kv_dim], qkv[..., d + kv_dim:]
    else:
        q = _sl(h, attn["q"], li)
        k = _sl(h, attn["k"], li)
        v = _sl(h, attn["v"], li)
    q = q.reshape(bs, L, cfg.n_heads, cfg.head_dim)
    k = k.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
    if cfg.pos == "rope":
        q, k = _rope(q, k, positions, cfg)
    if cfg.kv_heads != cfg.n_heads:
        rep = cfg.n_heads // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    attn_out = _sdpa(q, k, v, allowed, valid, cfg).reshape(bs, L, d)
    x = x + _sl(attn_out, attn["o"], li)
    if not cfg.pre_ln:
        x = _norm(x, _index_tree(lys["ln1"], li), cfg)

    h = _norm(x, _index_tree(lys["ln2"], li), cfg) if cfg.pre_ln else x
    mlp = lys["mlp"]
    if cfg.family == "llama":
        h = _sl(
            jax.nn.silu(_sl(h, mlp["gate"], li))
            * _sl(h, mlp["up"], li),
            mlp["down"], li,
        )
    else:
        h = _sl(
            _act(_sl(h, mlp["fc1"], li), cfg.act), mlp["fc2"], li
        )
    x = x + h
    if not cfg.pre_ln:
        x = _norm(x, _index_tree(lys["ln2"], li), cfg)
    return x


def apply(
    params: Params,
    cfg: BackboneConfig,
    inputs_embeds: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    *,
    lora: Optional[Params] = None,
    lora_cfg=None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    decode_slice: Optional[tuple[jnp.ndarray, int]] = None,
    positions_override: Optional[jnp.ndarray] = None,
    allowed_override: Optional[jnp.ndarray] = None,
    act_sharding=None,
    moe_aux: Optional[list] = None,
    moe_shardings=None,
    moe_capacity_tokens: Optional[int] = None,
    ring_spec=None,
) -> jnp.ndarray:
    """Run the backbone over ``inputs_embeds`` (bs, L, d) -> (bs, L, d).

    ``valid``: optional (bs, L) bool token-validity mask (True = real token).
    Dense input (valid=None) reproduces the reference exactly; masked input is
    used by the fixed-shape rollout window (see ``rollout/generate.py``).
    ``lora``/``lora_cfg``: optional adapter tree from ``models/lora.py``.
    ``decode_slice``: optional ``(start, length)`` (traced start, static
    length).  When set, the FINAL block computes queries/FFN only for that
    contiguous token range — exact for causal attention since later layers'
    outputs elsewhere are never read — and the result has shape
    (bs, length, d).  Rollout uses this to decode a single frame.
    ``positions_override``/``allowed_override``: replace the cumsum positions
    / causal mask — used by the streaming-equivalence oracle
    (``tests/test_streaming.py``) to express banded sliding-window attention.
    ``act_sharding``: optional ``NamedSharding`` pinned onto the residual
    stream at block boundaries — sequence parallelism the GSPMD way (the
    Megatron-SP pattern: tokens sharded over the tensor-parallel axis
    between blocks; XLA turns the TP all-reduces into reduce-scatter +
    all-gather pairs and runs LN/residual math on token shards).  Purely a
    layout annotation: no collective is issued by hand and the math is
    unchanged.
    ``moe_aux``: optional list collector — MoE blocks (``moe_experts > 0``)
    append one load-balance-loss scalar each; the trainer folds the mean
    into the training loss.
    """
    from fluid_llm_tpu.models.lora import lora_linear

    def _sp(h):
        if act_sharding is None or h.ndim != 3:
            return h
        return jax.lax.with_sharding_constraint(h, act_sharding)

    bs, L = inputs_embeds.shape[:2]
    d = cfg.d_model
    x = inputs_embeds.astype(cfg.dtype)
    if valid is None:
        valid = jnp.ones((bs, L), bool)
    positions, allowed = make_masks(valid)
    if positions_override is not None:
        positions = positions_override
    if allowed_override is not None:
        allowed = allowed_override
        # the Pallas flash kernel rebuilds causal+valid internally and cannot
        # honour an arbitrary mask — force the XLA path so a custom mask is
        # never silently dropped (e.g. the banded streaming oracle at >=2k
        # tokens under attn_impl=auto/flash)
        cfg = cfg.replace(attn_impl="xla")
        ring_spec = None  # the ring rebuilds causal+valid internally too

    # HF OPT order: project_in first, THEN add positional embeddings (which
    # live at d_model) — ``OPTDecoder.forward``
    if "project_in" in params:
        x = _linear(x, params["project_in"])

    if cfg.pos == "learned":
        pos_ids = positions + cfg.pos_offset
        x = x + params["pos_embed"][pos_ids].astype(cfg.dtype)

    dropout_rate = cfg.dropout if train else 0.0
    if dropout_rate > 0.0 and rng is None:
        raise ValueError("dropout requires an rng")
    n_drops = 1 + cfg.n_layers * 2
    # keys are threaded whenever an rng is supplied (LoRA dropout needs them
    # even when the backbone's own dropout is 0)
    drop_keys = jax.random.split(rng, n_drops) if rng is not None else [None] * n_drops

    def dropout(h, key):
        if dropout_rate == 0.0 or key is None:
            return h
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, h.shape)
        return jnp.where(keep, h / (1.0 - dropout_rate), 0.0)

    # OPT/GPT2 apply dropout to the embedding stream
    x = dropout(x, drop_keys[0])

    # Pallas exact-window attention (``ops/exact_attention.py``): packed
    # q/k/v consumed straight from the projections, one launch per layer,
    # query-block triangle skipping.  Engaged on TPU for full-head models
    # at window length; an allowed_override (banded oracle) or ring spec
    # forces XLA above, train-mode gradients route through its custom_vjp.
    from fluid_llm_tpu.ops import exact_attention as _xa

    use_xk, xk_interp = (False, False)
    if allowed_override is None and ring_spec is None and not train:
        use_xk, xk_interp = _xa.use_kernel(cfg, L)

    def block(x, layer_params, layer_lora, dk0, dk1):
        def lin(h, group, name):
            ad = None
            if layer_lora is not None:
                ad = layer_lora.get(group, {}).get(name)
            if ad is None:
                return _linear(h, layer_params[group][name])
            return lora_linear(h, layer_params[group][name], ad, lora_cfg, train=train, rng=dk0)

        # pre-LN (default) normalises the branch input; post-LN
        # (OPT-350m, ``do_layer_norm_before=False``) normalises after the
        # residual add — HF ``OPTDecoderLayer.forward``
        h = _norm(x, layer_params["ln1"], cfg) if cfg.pre_ln else x
        kv_dim = cfg.kv_heads * cfg.head_dim
        if "qkv" in layer_params["attn"]:
            if layer_lora is not None and any(
                n in layer_lora.get("attn", {}) for n in ("q", "k", "v")
            ):
                raise ValueError(
                    "packed qkv params cannot apply q/k/v LoRA adapters — "
                    "merge adapters first (FluidLLM.prepare_inference_params)"
                )
            # fused projection from pack_qkv_params (inference path)
            qkv = _linear(h, layer_params["attn"]["qkv"])
            q, k, v = (qkv[..., :d], qkv[..., d:d + kv_dim], qkv[..., d + kv_dim:])
        else:
            q = lin(h, "attn", "q")
            k = lin(h, "attn", "k")
            v = lin(h, "attn", "v")
        if use_xk and cfg.pos != "rope":
            # packed path: q/k/v go to the kernel exactly as the projections
            # emitted them — no (bs, L, H, hd) relayout at all
            attn_out = _xa.causal_attention(
                q, k, v, valid.astype(jnp.int32),
                cfg.n_heads, cfg.head_dim, xk_interp,
            )
        else:
            q = q.reshape(bs, L, cfg.n_heads, cfg.head_dim)
            k = k.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
            v = v.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
            if cfg.pos == "rope":
                q, k = _rope(q, k, positions, cfg)
            if use_xk:
                # rope models: fold the rope'd heads back into the packed
                # layout (one relayout — the XLA einsum path pays the same)
                attn_out = _xa.causal_attention(
                    q.reshape(bs, L, d), k.reshape(bs, L, d),
                    v.reshape(bs, L, d), valid.astype(jnp.int32),
                    cfg.n_heads, cfg.head_dim, xk_interp,
                )
            else:
                if cfg.kv_heads != cfg.n_heads:
                    rep = cfg.n_heads // cfg.kv_heads
                    k = jnp.repeat(k, rep, axis=2)
                    v = jnp.repeat(v, rep, axis=2)
                attn_out = _sdpa(q, k, v, allowed, valid, cfg, ring_spec=ring_spec)
                attn_out = attn_out.reshape(bs, L, d)
        attn_out = lin(attn_out, "attn", "o")
        x = x + dropout(attn_out, dk0)
        if not cfg.pre_ln:
            x = _norm(x, layer_params["ln1"], cfg)

        h = _norm(x, layer_params["ln2"], cfg) if cfg.pre_ln else x
        aux = jnp.zeros((), jnp.float32)
        if "router" in layer_params["mlp"]:
            h, aux = _moe_mlp(h, layer_params["mlp"], cfg, shardings=moe_shardings,
                              valid=valid, capacity_tokens=moe_capacity_tokens)
        elif cfg.family == "llama":
            h = lin(jax.nn.silu(lin(h, "mlp", "gate")) * lin(h, "mlp", "up"), "mlp", "down")
        else:
            h = lin(_act(lin(h, "mlp", "fc1"), cfg.act), "mlp", "fc2")
        # one residual dropout per branch (HF OPT/GPT-2 placement)
        x = x + dropout(h, dk1)
        if not cfg.pre_ln:
            x = _norm(x, layer_params["ln2"], cfg)
        # aux is a block OUTPUT (not a side-effect append) so jax.checkpoint
        # can wrap the block without leaking tracers
        return x, aux

    block_fn = jax.checkpoint(block, static_argnums=()) if cfg.remat else block

    stacked = not isinstance(params["layers"], list)
    n_full = cfg.n_layers - (1 if decode_slice is not None else 0)
    if stacked:
        # stacked inference layout (``stack_layers``): scan over blocks.
        # Adapters/dropout are a training concern — the stacked layout is
        # produced by ``prepare_inference_params`` after LoRA is merged.
        if lora is not None:
            raise ValueError("stacked layer params cannot apply a LoRA tree — "
                             "merge adapters before stack_layers")
        if train and dropout_rate > 0.0:
            raise ValueError("stacked layer params are inference-only "
                             "(dropout needs per-layer keys)")
        lys = params["layers"]

        def scan_block(h, li):
            return _sp(
                _block_stacked(h, lys, li, cfg, positions, allowed, valid)
            ), None

        body = jax.checkpoint(scan_block) if cfg.remat else scan_block
        x, _ = jax.lax.scan(body, _sp(x), jnp.arange(n_full), unroll=_scan_unroll())
        last_layer = jax.tree_util.tree_map(lambda a: a[-1], lys)
        last_lora = None
    else:
        lora_layers = (lora or {}).get("layers", [None] * cfg.n_layers)
        x = _sp(x)
        for li in range(n_full):
            x, aux = block_fn(x, params["layers"][li], lora_layers[li], drop_keys[1 + 2 * li], drop_keys[2 + 2 * li])
            x = _sp(x)
            if moe_aux is not None and "router" in params["layers"][li]["mlp"]:
                moe_aux.append(aux)
        last_layer = params["layers"][-1]
        last_lora = lora_layers[-1]

    if decode_slice is not None:
        x = _final_block_sliced(
            x, last_layer, last_lora, cfg, positions, valid,
            decode_slice, lora_cfg,
        )

    if cfg.final_ln:
        x = _norm(x, params["final_norm"], cfg)
    if "project_out" in params:
        x = _linear(x, params["project_out"])
    return x


def _final_block_sliced(x, layer_params, layer_lora, cfg: BackboneConfig,
                        positions, valid, decode_slice, lora_cfg):
    """Final transformer block computed only for a query slice (exact under
    causal attention; see ``apply`` docstring).  Inference-only (no dropout)."""
    from fluid_llm_tpu.models.lora import lora_linear

    start, ln = decode_slice
    bs, L, d = x.shape

    def lin(h, group, name):
        ad = None if layer_lora is None else layer_lora.get(group, {}).get(name)
        if ad is None:
            return _linear(h, layer_params[group][name])
        return lora_linear(h, layer_params[group][name], ad, lora_cfg)

    h = _norm(x, layer_params["ln1"], cfg) if cfg.pre_ln else x
    x_s = jax.lax.dynamic_slice_in_dim(x, start, ln, axis=1)
    h_q = jax.lax.dynamic_slice_in_dim(h, start, ln, axis=1)

    kv_dim = cfg.kv_heads * cfg.head_dim
    if "qkv" in layer_params["attn"]:
        if layer_lora is not None and any(
            n in layer_lora.get("attn", {}) for n in ("q", "k", "v")
        ):
            raise ValueError(
                "packed qkv params cannot apply q/k/v LoRA adapters — "
                "merge adapters first (FluidLLM.prepare_inference_params)"
            )
        # packed weights: q over the slice, fused k|v over the full window
        p_qkv = layer_params["attn"]["qkv"]
        w = materialize_w(p_qkv, h.dtype)
        b = p_qkv.get("b")
        q = h_q @ w[:, :d]
        kv = h @ w[:, d:]
        if b is not None:
            q = q + b[:d].astype(q.dtype)
            kv = kv + b[d:].astype(kv.dtype)
        k, v = kv[..., :kv_dim], kv[..., kv_dim:]
    else:
        q = lin(h_q, "attn", "q")
        k = lin(h, "attn", "k")
        v = lin(h, "attn", "v")
    q = q.reshape(bs, ln, cfg.n_heads, cfg.head_dim)
    k = k.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(bs, L, cfg.kv_heads, cfg.head_dim)
    if cfg.pos == "rope":
        pos_q = jax.lax.dynamic_slice_in_dim(positions, start, ln, axis=1)
        q, _ = _rope(q, q, pos_q, cfg)
        _, k = _rope(k, k, positions, cfg)
    if cfg.kv_heads != cfg.n_heads:
        rep = cfg.n_heads // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    rows = start + jnp.arange(ln)[None, :, None]  # (1, ln, 1)
    cols = jnp.arange(L)[None, None, :]
    allowed = (cols <= rows) & (valid[:, None, :] | (cols == rows))
    attn_out = _attention_xla(q, k, v, allowed[:, None], cfg.dtype)
    x_s = x_s + lin(attn_out.reshape(bs, ln, d), "attn", "o")
    if not cfg.pre_ln:
        x_s = _norm(x_s, layer_params["ln1"], cfg)

    h2 = _norm(x_s, layer_params["ln2"], cfg) if cfg.pre_ln else x_s
    if "router" in layer_params["mlp"]:
        # would compute expert capacity over the slice instead of the full
        # window — drop/keep decisions would diverge from the dense forward;
        # callers (fluid_llm.predict_frame_diffs) run MoE last blocks dense
        raise NotImplementedError(
            "decode_slice is not exact for MoE blocks (capacity couples "
            "tokens within a layer) — run the final block dense"
        )
    elif cfg.family == "llama":
        h2 = lin(jax.nn.silu(lin(h2, "mlp", "gate")) * lin(h2, "mlp", "up"), "mlp", "down")
    else:
        h2 = lin(_act(lin(h2, "mlp", "fc1"), cfg.act), "mlp", "fc2")
    x_s = x_s + h2
    if not cfg.pre_ln:
        x_s = _norm(x_s, layer_params["ln2"], cfg)
    return x_s


# --------------------------------------------------------------------------
# streaming KV-cache decode (TPU-native serving addition; no reference
# counterpart — the reference re-encodes the whole window every step,
# ``src/models/model.py:168-216``)
# --------------------------------------------------------------------------


def _slab_tokens(frame_tokens: int, n_sink: int) -> int:
    """Tokens per cache slab: the frame size (and the sink count, which
    shares the unified buffer) rounded up to the 16-sublane tile."""
    return max(-(-frame_tokens // 16) * 16, -(-max(n_sink, 1) // 16) * 16)


def init_streaming_cache(
    cfg: BackboneConfig, bs: int, n_sink: int, n_frames: int, frame_tokens: int
) -> Params:
    """Fixed-shape per-layer K/V cache: ONE buffer of tile-aligned slabs.

    ``k``/``v``: ``(L, bs, n_frames+1, P̂, kvh*hd)`` where ``P̂`` is
    ``frame_tokens`` rounded up to the 16-sublane tile.  Slots
    ``0..n_frames-1`` are the frame ring — each decode step overwrites ONE
    whole slab at a dynamic index on the major slot dim (a contiguous,
    tile-aligned store; the flat token ring this design replaced updated 60
    tokens at a tile-unaligned minor-dim offset, which lowers to a
    read-modify-write of every straddled tile — measured ~37 % of the
    streaming step).  Slot ``n_frames`` holds the pinned attention sinks,
    written once at prefill (``n_sink <= P̂`` by construction).

    Three deliberate layout choices, all for the read-bound decode step:

    - head dims FOLDED ``(..., kvh*hd)`` with head ``h`` at columns
      ``[h*hd, (h+1)*hd)`` (the packed qkv-projection output): unfolded
      ``(12, 64)`` minor dims physically tile to ``(16, 128)`` — 2.67×
      padding on every cache byte;
    - slabs padded to ``P̂`` tokens: a ``(P̂, kvh*hd)`` slab is an exact
      sublane-tile multiple, so flattening ``(slots, P̂)`` into one key axis
      is layout-trivial — the Pallas kernel (``ops/decode_attention.py``)
      reads the whole buffer as ``(slots*P̂, lanes)`` with zero relayout;
    - sinks IN the same buffer: the kernel needs no second input or concat.

    ``sink_pos`` holds each sink token's absolute position; ``ring_pos``
    holds each ring slot's FIRST-token position (-1 = never written) —
    tokens within a frame are consecutive by contract (``apply_streaming``),
    so per-key positions are ``ring_pos[:, None] + arange(P̂)`` with rows
    ``>= frame_tokens`` (the pad) invalid.  Overwritten slots simply get the
    new frame's (k, v, pos) — the mask ``pos <= q_pos`` stays correct
    because every resident token precedes the incoming queries.
    """
    kvd = cfg.kv_heads * cfg.head_dim
    L = cfg.n_layers
    pp = _slab_tokens(frame_tokens, n_sink)
    if n_sink > pp:
        raise ValueError(f"n_sink={n_sink} exceeds the slab size {pp}")
    return {
        "k": jnp.zeros((L, bs, n_frames + 1, pp, kvd), cfg.dtype),
        "v": jnp.zeros((L, bs, n_frames + 1, pp, kvd), cfg.dtype),
        "sink_pos": jnp.full((n_sink,), -1, jnp.int32),
        "ring_pos": jnp.full((n_frames,), -1, jnp.int32),
    }


def _attention_slabs(q, k_slabs, v_slabs, allowed, cfg: BackboneConfig):
    """XLA fallback attention over the unified slab cache.

    q: (bs, Ln, H, hd); slabs: (bs, slots, P̂, kvh*hd) folded; allowed:
    (1, 1, Ln, slots*P̂) — pad rows and unwritten slots are already masked
    off by the caller's key-position row.  (TPU decode dispatches to the
    Pallas kernel in ``ops/decode_attention.py`` that reads the slabs in
    place; this path serves prefill, CPU, and unsupported head shapes.)
    """
    bs = q.shape[0]
    kvh, hd = cfg.kv_heads, cfg.head_dim
    slots, pp = k_slabs.shape[1:3]
    kk = k_slabs.reshape(bs, slots * pp, kvh, hd)
    vv = v_slabs.reshape(bs, slots * pp, kvh, hd)
    if cfg.kv_heads != cfg.n_heads:
        rep = cfg.n_heads // cfg.kv_heads
        kk, vv = jnp.repeat(kk, rep, axis=2), jnp.repeat(vv, rep, axis=2)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, kk.astype(cfg.dtype),
                        preferred_element_type=jnp.float32)
    logits = jnp.where(allowed, logits * scale, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vv.astype(cfg.dtype))


def apply_streaming(
    params: Params,
    cfg: BackboneConfig,
    x_new: jnp.ndarray,
    new_positions: jnp.ndarray,
    cache: Params,
    write_slot,
    *,
    prefill: bool = False,
    frame_tokens: Optional[int] = None,
) -> tuple[jnp.ndarray, Params]:
    """Run all blocks over ``x_new`` (bs, Ln, d) against cached K/V.

    Each token is encoded ONCE: its K/V enter the cache (post-rope) and are
    never recomputed, so earlier tokens keep the representations they had
    when the now-evicted frames were still visible — standard sliding-window
    LLM serving semantics (equal to dense attention with a banded mask), NOT
    the reference's re-encode-per-window semantics.  Requires rotary
    positions (relative ⇒ cache-stable); learned-position backbones
    (OPT/GPT-2) re-base token positions per window, so their caches would be
    semantically wrong — rejected here.

    ``new_positions``: (Ln,) absolute token positions, shared across batch;
    CONSECUTIVE within each frame (the ring stores one base position per
    slot).  Decode (default): ``x_new`` is exactly ONE frame of
    ``frame_tokens`` tokens, written as a whole slab at ring slot
    ``write_slot`` (traced frame index, callers pass ``f % n_frames``).
    ``prefill=True``: ``x_new`` is the sink tokens followed by zero or more
    whole frames, written at static offsets (sinks + ring slots ``0..``);
    ``write_slot`` is ignored and ``frame_tokens`` must be passed when
    frames are included (the padded cache slabs don't pin the frame size).
    Inference-only: merged LoRA (``prepare_inference_params``), no dropout.
    """
    if cfg.pos != "rope":
        raise ValueError(
            "streaming decode requires rotary positions (llama family); "
            f"backbone family {cfg.family!r} uses {cfg.pos!r} positions"
        )
    bs, Ln = x_new.shape[:2]
    d = cfg.d_model
    kvh, hd = cfg.kv_heads, cfg.head_dim
    kv_dim = kvh * hd
    n_sink = cache["sink_pos"].shape[0]
    slots, pp = cache["k"].shape[2:4]
    F = slots - 1  # ring slots; slot F holds the sinks
    x = x_new.astype(cfg.dtype)
    if "project_in" in params:
        x = _linear(x, params["project_in"])

    new_positions = new_positions.astype(jnp.int32)
    if prefill:
        if frame_tokens is None:
            if Ln != n_sink:
                raise ValueError(
                    "prefill with frames needs frame_tokens= (the padded "
                    "cache slabs don't pin the frame size)"
                )
            frame_tokens = pp  # sinks only; any value works
        P = frame_tokens
        n_fr = (Ln - n_sink) // P
        if n_sink + n_fr * P != Ln:
            raise ValueError(
                f"prefill must be sinks ({n_sink}) + whole frames of {P} "
                f"tokens; got {Ln} tokens"
            )
        sink_pos = new_positions[:n_sink]
        ring_pos = cache["ring_pos"]
        if n_fr:
            ring_pos = ring_pos.at[:n_fr].set(new_positions[n_sink::P])
    else:
        P = Ln  # decode appends exactly one frame
        if frame_tokens is not None and frame_tokens != P:
            raise ValueError(
                f"decode appends exactly one frame of {frame_tokens} tokens; got {P}"
            )
        if P > pp:
            raise ValueError(f"frame of {P} tokens exceeds the {pp}-token slab")
        n_fr = 0
        sink_pos = cache["sink_pos"]
        ring_pos = cache["ring_pos"].at[write_slot].set(new_positions[0])

    # every resident token precedes (or is) each query: causality — including
    # among the Ln new tokens themselves — reduces to a position comparison.
    # One int32 key-position row covers the whole slab buffer (ring slots
    # then the sink slot); unwritten slots and slab pad rows get INT32_MAX
    # so ``key_pos <= q_pos`` is False for them.
    qpos = new_positions
    big = jnp.iinfo(jnp.int32).max
    row = jnp.arange(pp, dtype=jnp.int32)
    ring_kp = jnp.where(
        (ring_pos >= 0)[:, None] & (row < P)[None, :],
        ring_pos[:, None] + row[None, :], big,
    )  # (F, P̂)
    sink_pad = jnp.full((pp,), -1, jnp.int32)
    if n_sink:
        sink_pad = sink_pad.at[:n_sink].set(sink_pos)
    sink_kp = jnp.where(sink_pad >= 0, sink_pad, big)
    kp_row = jnp.concatenate([ring_kp.reshape(F * pp), sink_kp])  # (slots*P̂,)
    allowed = (kp_row[None, :] <= qpos[:, None])[None, None]  # (1,1,Ln,slots*P̂)
    pos_b = jnp.broadcast_to(new_positions[None, :], (bs, Ln))

    # the stacked (n_layers, ...) buffers are THREADED through the layer
    # loop with per-layer updates at a static layer index — never sliced
    # out and restacked, which would force XLA to copy every layer's buffer
    # on every decode step; as a scan carry the updates alias in place
    ck, cv = cache["k"], cache["v"]

    # Pallas decode-attention over the slab cache (unrolled layout only —
    # the stacked scan's traced layer index cannot be baked into BlockSpecs)
    from fluid_llm_tpu.ops import decode_attention as _da

    use_dk, dk_interp = (False, False)
    if not prefill and isinstance(params["layers"], list):
        use_dk, dk_interp = _da.use_kernel(cfg)
    if use_dk:
        dk_key_pos = _da.pad_key_pos(kp_row)
        dk_q0 = new_positions[:1].reshape(1, 1)

    def _pad_slab(arr):
        # (bs, P, kv_dim) -> (bs, 1, P̂, kv_dim): zero rows P..P̂ (masked)
        return jnp.pad(arr, ((0, 0), (0, pp - P), (0, 0)))[:, None]

    def layer_step(x, ck, cv, li, lp):
        # unrolled (list-layout) path only — the stacked layout runs the
        # separate lax.scan ``body`` below
        lin = lambda h, g, n: _linear(h, lp[g][n])
        ln = lambda n: lp[n]
        attn_names = lp["attn"]
        h = _norm(x, ln("ln1"), cfg) if cfg.pre_ln else x
        if "qkv" in attn_names:
            qkv = lin(h, "attn", "qkv")
            q, k, v = qkv[..., :d], qkv[..., d:d + kv_dim], qkv[..., d + kv_dim:]
        else:
            q = lin(h, "attn", "q")
            k = lin(h, "attn", "k")
            v = lin(h, "attn", "v")
        q = q.reshape(bs, Ln, cfg.n_heads, cfg.head_dim)
        k = k.reshape(bs, Ln, kvh, hd)
        v = v.reshape(bs, Ln, kvh, hd)
        q, k = _rope(q, k, pos_b, cfg)

        if prefill:
            if n_sink:
                ks = k[:, :n_sink].reshape(bs, n_sink, kv_dim)
                vs = v[:, :n_sink].reshape(bs, n_sink, kv_dim)
                ck = ck.at[li, :, F, :n_sink].set(ks.astype(ck.dtype))
                cv = cv.at[li, :, F, :n_sink].set(vs.astype(cv.dtype))
            if n_fr:
                kf = k[:, n_sink:].reshape(bs, n_fr, P, kv_dim)
                vf = v[:, n_sink:].reshape(bs, n_fr, P, kv_dim)
                ck = ck.at[li, :, :n_fr, :P].set(kf.astype(ck.dtype))
                cv = cv.at[li, :, :n_fr, :P].set(vf.astype(cv.dtype))
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, _pad_slab(k.reshape(bs, P, kv_dim)).astype(ck.dtype)[None],
                (li, 0, write_slot, 0, 0),
            )
            cv = jax.lax.dynamic_update_slice(
                cv, _pad_slab(v.reshape(bs, P, kv_dim)).astype(cv.dtype)[None],
                (li, 0, write_slot, 0, 0),
            )

        if use_dk:
            attn_flat = _da.slab_decode(
                q.reshape(bs, Ln, cfg.n_heads * hd), ck, cv,
                dk_key_pos, dk_q0, li, hd, interpret=dk_interp,
            )
        else:
            attn_out = _attention_slabs(
                q,
                jax.lax.dynamic_index_in_dim(ck, li, 0, False),
                jax.lax.dynamic_index_in_dim(cv, li, 0, False),
                allowed, cfg,
            )
            attn_flat = attn_out.reshape(bs, Ln, d)
        x = x + lin(attn_flat, "attn", "o")
        if not cfg.pre_ln:
            x = _norm(x, ln("ln1"), cfg)

        h2 = _norm(x, ln("ln2"), cfg) if cfg.pre_ln else x
        if lp is not None and "router" in lp["mlp"]:
            # Top-k MoE is per-token (routing reads only the token's own
            # hidden state), so it composes with KV-cache streaming
            # unchanged; expert capacity applies per decode chunk
            # (C = ceil(k·Ln·cf/E) over the Ln new tokens) rather than per
            # training window — strictly gentler at small Ln.  aux unused.
            # expert_choice routing is chunk-local here BY CONSTRUCTION
            # (experts pick their top-C of the Ln new tokens, not of the
            # training window) — serve expert_choice models through the
            # exact rollout when full-window routing semantics matter.
            h2, _ = _moe_mlp(h2, lp["mlp"], cfg)
        elif cfg.family == "llama":
            h2 = lin(
                jax.nn.silu(lin(h2, "mlp", "gate")) * lin(h2, "mlp", "up"),
                "mlp", "down",
            )
        else:
            h2 = lin(_act(lin(h2, "mlp", "fc1"), cfg.act), "mlp", "fc2")
        x = x + h2
        if not cfg.pre_ln:
            x = _norm(x, ln("ln2"), cfg)
        return x, ck, cv

    if isinstance(params["layers"], list):
        for li in range(cfg.n_layers):
            x, ck, cv = layer_step(x, ck, cv, li, params["layers"][li])
    else:
        # stacked layout (``stack_layers``): scan over blocks — same math,
        # ~n_layers× smaller program.  The cache rides the scan's xs/ys:
        # each iteration consumes ONE layer's slices and emits the updated
        # slices, which lax.scan writes into the stacked output at the
        # iteration index.  Keeping the full stack in the carry instead
        # measures ~0.3 ms/step slower — XLA copies the whole (n_layers,
        # ...) buffer around the traced-index update.
        lys = params["layers"]

        def body(x, xs):
            k_l, v_l, li = xs
            lin = lambda h2, g, n: _stacked_linear(h2, lys[g][n], li)
            ln = lambda n: _index_tree(lys[n], li)
            attn_names = lys["attn"]
            h = _norm(x, ln("ln1"), cfg) if cfg.pre_ln else x
            if "qkv" in attn_names:
                qkv = lin(h, "attn", "qkv")
                q, k, v = (qkv[..., :d], qkv[..., d:d + kv_dim],
                           qkv[..., d + kv_dim:])
            else:
                q = lin(h, "attn", "q")
                k = lin(h, "attn", "k")
                v = lin(h, "attn", "v")
            q = q.reshape(bs, Ln, cfg.n_heads, cfg.head_dim)
            k = k.reshape(bs, Ln, kvh, hd)
            v = v.reshape(bs, Ln, kvh, hd)
            q, k = _rope(q, k, pos_b, cfg)
            if prefill:
                if n_sink:
                    ks = k[:, :n_sink].reshape(bs, n_sink, kv_dim)
                    vs = v[:, :n_sink].reshape(bs, n_sink, kv_dim)
                    k_l = k_l.at[:, F, :n_sink].set(ks.astype(k_l.dtype))
                    v_l = v_l.at[:, F, :n_sink].set(vs.astype(v_l.dtype))
                if n_fr:
                    kf = k[:, n_sink:].reshape(bs, n_fr, P, kv_dim)
                    vf = v[:, n_sink:].reshape(bs, n_fr, P, kv_dim)
                    k_l = k_l.at[:, :n_fr, :P].set(kf.astype(k_l.dtype))
                    v_l = v_l.at[:, :n_fr, :P].set(vf.astype(v_l.dtype))
            else:
                k_l = jax.lax.dynamic_update_slice(
                    k_l, _pad_slab(k.reshape(bs, P, kv_dim)).astype(k_l.dtype),
                    (0, write_slot, 0, 0),
                )
                v_l = jax.lax.dynamic_update_slice(
                    v_l, _pad_slab(v.reshape(bs, P, kv_dim)).astype(v_l.dtype),
                    (0, write_slot, 0, 0),
                )
            attn_out = _attention_slabs(q, k_l, v_l, allowed, cfg)
            x = x + lin(attn_out.reshape(bs, Ln, d), "attn", "o")
            if not cfg.pre_ln:
                x = _norm(x, ln("ln1"), cfg)
            h2 = _norm(x, ln("ln2"), cfg) if cfg.pre_ln else x
            if cfg.family == "llama":
                h2 = lin(
                    jax.nn.silu(lin(h2, "mlp", "gate")) * lin(h2, "mlp", "up"),
                    "mlp", "down",
                )
            else:
                h2 = lin(_act(lin(h2, "mlp", "fc1"), cfg.act), "mlp", "fc2")
            x = x + h2
            if not cfg.pre_ln:
                x = _norm(x, ln("ln2"), cfg)
            return x, (k_l, v_l)

        x, (ck, cv) = jax.lax.scan(
            body, x,
            (ck, cv, jnp.arange(cfg.n_layers)),
            unroll=_scan_unroll(),
        )

    if cfg.final_ln:
        x = _norm(x, params["final_norm"], cfg)
    if "project_out" in params:
        x = _linear(x, params["project_out"])
    new_cache = {
        "k": ck, "v": cv, "sink_pos": sink_pos, "ring_pos": ring_pos,
    }
    return x, new_cache


def _sdpa(q, k, v, allowed, valid, cfg: BackboneConfig, ring_spec=None):
    """Dispatch attention to a Pallas kernel on TPU or the XLA path.

    ``ring_spec``: optional ``(mesh, axis)`` — route to the ring-attention
    context-parallel path (tokens sharded over ``axis``, K/V rotating via
    ppermute; ``parallel/ring_attention.py``).  Exact under the same mask
    semantics; engaged by ``parallel.ring_attention`` through ``apply``.

    Measured crossovers on v5e: above ~2k tokens the tiled flash kernel wins
    (1.7x at 4k, >25x at 8k).  Below, XLA beats flash but still materialises
    the (H, L, L) f32 logits in HBM — ~0.5 GB per rollout step at the
    reference's 661 tokens — so the single-block ``short_attention`` kernel
    (whole problem VMEM-resident, no logits round-trip) takes that range.
    """
    if ring_spec is not None:
        from fluid_llm_tpu.parallel.ring_attention import ring_attention

        mesh, ax = ring_spec
        return ring_attention(q, k, v, valid, mesh, ax)
    impl = cfg.attn_impl
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto":
        # measured (BENCHMARKS.md): XLA wins below ~2k tokens — including
        # against the VMEM-resident ``ops/short_attention.py`` kernel
        # (800 vs 508 steps/s on the rollout; launch count + qkv transposes
        # + K/V refetch outweigh the saved logits round-trip).  ``short``
        # stays available as an explicit attn_impl for larger-head shapes.
        impl = "flash" if (on_tpu and q.shape[1] >= 2048) else "xla"
    if impl == "short":
        try:
            from fluid_llm_tpu.ops.short_attention import short_attention, supported

            # the VMEM budget check must run BEFORE pallas_call: an
            # oversized program traces fine inside this try (Mosaic only
            # fails later at compile time, past any except)
            if not supported(q.shape, q.dtype):
                raise ValueError(
                    f"short_attention unsupported at {q.shape} "
                    "(token/VMEM/head-dim limits)"
                )
            return short_attention(q, k, v, valid)
        except Exception as e:
            from fluid_llm_tpu.utils import kernel_fallback

            kernel_fallback("pallas short attention", e)
    if impl == "flash":
        try:
            from fluid_llm_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v, valid)
        except Exception as e:
            from fluid_llm_tpu.utils import kernel_fallback

            kernel_fallback("pallas flash attention", e)
    return _attention_xla(q, k, v, allowed, cfg.dtype)
