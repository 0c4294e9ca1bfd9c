"""FluidLLM: patches -> LLM backbone -> per-pixel diff predictions.

Functional equivalent of ``MultivariateTimeLLM`` (``src/models/model.py:26``):

- patch embeddings + 3-axis positional encodings (``model.py:84-89``),
- flatten (bs, seq, N_patch, d) -> (bs, seq*N_patch, d) (``model.py:138``),
- optional trainable BOS embedding prepended (``model.py:62-73,139-142``),
- causal LLM backbone on ``inputs_embeds`` (token embeddings bypassed — the
  ``PassthroughEmbeddings`` trick at ``model.py:102-104``),
- patch decoder to per-pixel (Vx, Vy, P) diffs, scaled by
  ``diff_scale_factor`` (``model.py:148-152``),
- ``forward_see_init`` duplicates the first frame so the model sees the full
  initial condition before predicting (``model.py:118-126``).

Generation lives in ``rollout/generate.py`` as a ``lax.scan``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data.ds_props import DSProps
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.models.decoders import patch_decoder_apply, patch_decoder_init
from fluid_llm_tpu.models.embeddings import input_embeddings_apply, input_embeddings_init
from fluid_llm_tpu.models.lora import init_lora

Params = dict[str, Any]


@dataclass(frozen=True)
class FluidLLM:
    """Static model definition; parameters live in a separate pytree."""

    cfg: Config
    ds_props: DSProps
    backbone_cfg: bb.BackboneConfig

    @classmethod
    def build(cls, cfg: Config, ds_props: DSProps, **backbone_overrides) -> "FluidLLM":
        dtype = jnp.bfloat16 if cfg.half_precision else jnp.float32
        base_kw = dict(
            dtype=dtype,
            remat=cfg.parallel.remat,
            attn_impl="auto" if cfg.flash_attention else "xla",
        )
        if cfg.moe.experts > 0:
            if cfg.parallel.pipe_axis > 1:
                raise ValueError(
                    "MoE backbones use per-layer expert banks, which the "
                    "stacked pipeline layout does not support — set "
                    "parallel.pipe_axis to 1 (shard experts via "
                    "parallel.expert_axis instead)"
                )
            if cfg.moe.router not in ("topk", "expert_choice"):
                raise ValueError(
                    f"moe.router={cfg.moe.router!r} — use 'topk' "
                    "(Switch/GShard) or 'expert_choice'"
                )
            if not 1 <= cfg.moe.top_k <= cfg.moe.experts:
                raise ValueError(
                    f"moe.top_k={cfg.moe.top_k} must be in [1, "
                    f"moe.experts={cfg.moe.experts}] — the top-k selection "
                    "loop would re-pick expert 0 with its un-zeroed "
                    "probability once every expert is taken"
                )
            if cfg.parallel.expert_axis > 1 and (
                cfg.moe.experts % cfg.parallel.expert_axis != 0
            ):
                raise ValueError(
                    f"moe.experts={cfg.moe.experts} must divide evenly over "
                    f"parallel.expert_axis={cfg.parallel.expert_axis} (the "
                    "stacked (E, ...) expert weights shard their leading "
                    "axis over the expert mesh axis)"
                )
            base_kw.update(
                moe_experts=cfg.moe.experts,
                moe_top_k=cfg.moe.top_k,
                moe_capacity_factor=cfg.moe.capacity_factor,
                moe_router=cfg.moe.router,
            )
        base_kw.update(backbone_overrides)
        bcfg = bb.preset(cfg.llm_backbone, cfg.llm_layers).replace(**base_kw)
        return cls(cfg=cfg, ds_props=ds_props, backbone_cfg=bcfg)

    # ``max_seq_len``: +1 input frame when see_init duplicates frame 0
    # (``model.py:79``); the positional-embedding t-table must cover it.
    @property
    def max_seq_len(self) -> int:
        return self.ds_props.seq_len + 1 if self.cfg.see_init_state else self.ds_props.seq_len

    @property
    def max_ctx_len(self) -> int:
        return self.max_seq_len  # ``model.py:94``

    @property
    def tokens_per_frame(self) -> int:
        return self.ds_props.N_patch

    def prepare_inference_params(self, params: Params) -> Params:
        """Exact inference-time param transform: fold LoRA/DoRA adapters into
        the backbone (``lora.merge_lora``), fuse each layer's q/k/v into one
        projection (``backbone.pack_qkv_params``), and cast matmul weights
        to the activation dtype (``backbone.cast_matmul_params``).  Same
        math, fewer and larger MXU dispatches — used by the rollout/serving
        path.  ``FLUID_SCAN_LAYERS=1`` additionally stacks the layer list
        into the scanned layout (``backbone.stack_layers``): ~n_layers×
        smaller programs, ~10× faster cold compile, at -38 % serving
        throughput (measured tradeoff table in BENCHMARKS.md) — off by
        default."""
        import os

        p = dict(params)
        # pipeline-trained checkpoints carry the stacked layout; the weight
        # transforms below operate per layer — unstack first (the scanned
        # serving layout re-stacks at the end)
        p["backbone"] = bb.unstack_layers(p["backbone"])
        if "lora" in p:
            from fluid_llm_tpu.models.lora import merge_lora

            p = dict(p)
            p["backbone"] = merge_lora(p["backbone"], p["lora"], self.cfg.lora_config)
            del p["lora"]
        p["backbone"] = bb.pack_qkv_params(p["backbone"])
        p["backbone"] = bb.cast_matmul_params(
            p["backbone"], self.backbone_cfg.dtype
        )
        if os.environ.get("FLUID_SCAN_LAYERS", "0") == "1":
            p["backbone"] = bb.stack_layers(p["backbone"])
        return p

    def init(self, key: jax.Array) -> Params:
        k_bb, k_emb, k_dec, k_lora, k_bos = jax.random.split(key, 5)
        # encoder/decoder/BOS live at the backbone's embedding dim — equal to
        # d_model except OPT-350m (word_embed_proj_dim=512, HF project_in/out)
        d = self.backbone_cfg.embed_dim
        params: Params = {
            "backbone": bb.init_params(k_bb, self.backbone_cfg),
            "input_emb": input_embeddings_init(
                k_emb,
                self.ds_props.patch_in_dim,
                d,
                (self.ds_props.Nx_patch, self.ds_props.Ny_patch, self.max_seq_len),
                self.cfg.encoder_params,
                self.cfg.pos_embedding_params,
            ),
            "decoder": patch_decoder_init(k_dec, d, self.ds_props, self.cfg.decoder_params),
        }
        if self.cfg.use_bos_token:
            # Initialised from the pretrained BOS embedding when HF weights are
            # imported (``model.py:70-73``); random otherwise.
            params["bos"] = jax.random.normal(k_bos, (d,), jnp.float32) * 0.02
        if self.cfg.use_lora and not self.cfg.freeze_llm:
            params["lora"] = init_lora(k_lora, params["backbone"], self.cfg.lora_config)
        if self.cfg.parallel.pipe_axis > 1:
            # pipeline parallelism runs the stacked layer layout from the
            # start (stage = contiguous slice of the stacked leaves)
            if "lora" in params:
                raise ValueError("pipeline parallelism requires full-FT "
                                 "(use_lora: false) — per-layer LoRA trees "
                                 "don't apply to the stacked layout")
            params["backbone"] = bb.stack_layers(params["backbone"])
        return params

    def trainable_mask(self, params: Params) -> Params:
        """True where a leaf receives gradients (peft/freeze semantics,
        ``model.py:106-116``)."""
        backbone_trainable = not self.cfg.freeze_llm and not self.cfg.use_lora

        def mask_subtree(tree, flag):
            return jax.tree_util.tree_map(lambda _: flag, tree)

        out = {}
        for name, sub in params.items():
            flag = True if name != "backbone" else backbone_trainable
            out[name] = mask_subtree(sub, flag)
        return out

    # -- forward ------------------------------------------------------------

    def _moe_shardings(self):
        """EP sharding constraints for ``_moe_mlp`` (see backbone.py) — built
        whenever expert parallelism is configured; None otherwise."""
        cfg = self.cfg
        if not (cfg.moe.experts > 0 and cfg.parallel.expert_axis > 1):
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fluid_llm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.parallel)
        return (
            NamedSharding(mesh, P("expert")),
            NamedSharding(mesh, P(("data", "fsdp", "expert"))),
        )

    def forward(
        self,
        params: Params,
        x: jnp.ndarray,
        position_ids: jnp.ndarray,
        *,
        frame_valid: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        moe_aux: Optional[list] = None,
    ) -> jnp.ndarray:
        """``model.py:128-152``.

        x: (bs, seq, N_patch, 3, px, py); position_ids: (bs, seq, N_patch, 3).
        frame_valid: optional (bs, seq) bool — used by the fixed-shape rollout
        window; None means all frames are real (the reference's only case).
        Returns diffs as images (bs, seq, 3, tot_px, tot_py).
        """
        cfg = self.cfg
        bs, seq_len, n_patch = x.shape[:3]
        if rng is not None:
            r_emb, r_bb, r_dec = jax.random.split(rng, 3)
        else:
            r_emb = r_bb = r_dec = None

        h = input_embeddings_apply(
            params["input_emb"], x, position_ids, cfg.encoder_params,
            cfg.pos_embedding_params, train=train, rng=r_emb,
            spatial_scale=(self.ds_props.Nx_patch, self.ds_props.Ny_patch),
        )
        h = h.astype(self.backbone_cfg.dtype)
        h = h.reshape(bs, seq_len * n_patch, -1)

        if frame_valid is None:
            token_valid = jnp.ones((bs, seq_len * n_patch), bool)
        else:
            token_valid = jnp.repeat(frame_valid, n_patch, axis=1)

        if cfg.use_bos_token:
            bos = jnp.broadcast_to(
                params["bos"].astype(h.dtype)[None, None, :], (bs, 1, h.shape[-1])
            )
            h = jnp.concatenate([bos, h], axis=1)
            token_valid = jnp.concatenate([jnp.ones((bs, 1), bool), token_valid], axis=1)

        if cfg.parallel.pipe_axis > 1:
            # pipeline-parallel backbone (GPipe schedule over the ``pipe``
            # mesh axis, ``parallel/pipeline.py``) — stacked full-FT layout
            from fluid_llm_tpu.parallel.mesh import make_mesh
            from fluid_llm_tpu.parallel.pipeline import apply_pipelined

            if params.get("lora"):
                raise ValueError(
                    "pipeline parallelism uses the stacked layer layout, "
                    "which cannot apply per-layer LoRA trees — train "
                    "full-FT (use_lora: false) or merge adapters first"
                )
            if train and self.backbone_cfg.dropout > 0.0:
                raise ValueError(
                    "the pipelined backbone is dropout-free (stacked "
                    "scan layout) — set the backbone dropout to 0"
                )
            out = apply_pipelined(
                params["backbone"], self.backbone_cfg, h, token_valid,
                mesh=make_mesh(cfg.parallel),
                n_microbatches=cfg.parallel.pipe_microbatches,
                remat=cfg.parallel.remat,
            )
        else:
            act_sharding = None
            if cfg.parallel.seq_sharded_acts and cfg.parallel.model_axis > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from fluid_llm_tpu.parallel.mesh import make_mesh

                act_sharding = NamedSharding(
                    make_mesh(cfg.parallel), P(("data", "fsdp"), "model")
                )
            ring_spec = None
            if cfg.parallel.ring_attention:
                if not (cfg.parallel.seq_sharded_acts and cfg.parallel.model_axis > 1):
                    raise ValueError(
                        "parallel.ring_attention needs tokens sharded over "
                        "the model axis — set seq_sharded_acts: true and "
                        "model_axis > 1"
                    )
                from fluid_llm_tpu.parallel.mesh import make_mesh

                ring_spec = (make_mesh(cfg.parallel), "model")
            # the ring shards tokens evenly: pad to a multiple of the axis
            # with INVALID tokens (masked keys, outputs trimmed below —
            # exact, same argument as FLUID_PAD_TOKENS; the reference
            # window is 661 tokens, indivisible by any axis)
            ring_pad = 0
            moe_capacity_tokens = None
            if ring_spec is not None:
                L_tok = h.shape[1]
                ring_pad = (-L_tok) % cfg.parallel.model_axis
                if ring_pad and cfg.moe.experts > 0:
                    # expert capacity stays based on the real token count
                    moe_capacity_tokens = L_tok
                if ring_pad:
                    h = jnp.pad(h, ((0, 0), (0, ring_pad), (0, 0)))
                    token_valid = jnp.pad(
                        token_valid, ((0, 0), (0, ring_pad))
                    )
            # [0]: per-expert tensors (E, bs, C, d) live on their expert's
            # devices (the dispatch einsum becomes the all-to-all);
            # [1]: combined (bs, L, d) returns to the batch sharding
            moe_shardings = self._moe_shardings()
            out = bb.apply(
                params["backbone"], self.backbone_cfg, h, token_valid,
                lora=params.get("lora"), lora_cfg=cfg.lora_config, train=train, rng=r_bb,
                act_sharding=act_sharding, moe_aux=moe_aux,
                moe_shardings=moe_shardings, ring_spec=ring_spec,
                moe_capacity_tokens=moe_capacity_tokens,
            )
            if ring_pad:
                out = out[:, :-ring_pad]
        if cfg.use_bos_token:
            out = out[:, 1:]

        tokens = out.reshape(bs, seq_len, n_patch, -1)
        preds = patch_decoder_apply(
            params["decoder"], tokens, self.ds_props, cfg.decoder_params,
            train=train, rng=r_dec,
        )
        # (bs, seq, X, Y, 3) -> (bs, seq, 3, X, Y), scaled (``model.py:151-152``)
        preds = jnp.transpose(preds, (0, 1, 4, 2, 3)).astype(jnp.float32)
        return preds * cfg.diff_scale_factor

    def forward_see_init(
        self,
        params: Params,
        states: jnp.ndarray,
        position_ids: jnp.ndarray,
        *,
        frame_valid: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        moe_aux: Optional[list] = None,
    ) -> jnp.ndarray:
        """Duplicate the first frame, run forward, drop its prediction
        (``model.py:118-126``).  With ``frame_valid`` the duplicated slot is
        the *first valid* frame handled by the rollout caller."""
        states = jnp.concatenate([states[:, :1], states], axis=1)
        position_ids = jnp.concatenate([position_ids[:, :1], position_ids], axis=1)
        if frame_valid is not None:
            frame_valid = jnp.concatenate([frame_valid[:, :1], frame_valid], axis=1)
        preds = self.forward(
            params, states, position_ids, frame_valid=frame_valid, train=train,
            rng=rng, moe_aux=moe_aux,
        )
        return preds[:, 1:]

    def predict_diffs(self, params: Params, states, position_ids, **kw) -> jnp.ndarray:
        """Dispatch on ``see_init_state`` (``trainer.py:89-92``)."""
        if self.cfg.see_init_state:
            return self.forward_see_init(params, states, position_ids, **kw)
        return self.forward(params, states, position_ids, **kw)

    def embed_frames(self, params: Params, states, position_ids) -> jnp.ndarray:
        """Inference-path input embeddings for whole frames.

        states: (bs, f, N_patch, C, px, py); position_ids: (bs, f, N_patch, 3)
        -> (bs, f*N_patch, d) in the backbone dtype.  Used by the streaming
        rollout to encode each new frame exactly once.
        """
        h = input_embeddings_apply(
            params["input_emb"], states, position_ids, self.cfg.encoder_params,
            self.cfg.pos_embedding_params,
            spatial_scale=(self.ds_props.Nx_patch, self.ds_props.Ny_patch),
        )
        bs, f, n = states.shape[:3]
        return h.astype(self.backbone_cfg.dtype).reshape(bs, f * n, -1)

    def decode_frame_tokens(self, params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
        """Backbone output tokens of ONE frame (bs, N_patch, d) -> diff image
        (bs, 3, X, Y), scaled (``model.py:151-152``)."""
        preds = patch_decoder_apply(
            params["decoder"], tokens[:, None], self.ds_props, self.cfg.decoder_params
        )
        preds = jnp.transpose(preds[:, 0], (0, 3, 1, 2)).astype(jnp.float32)
        return preds * self.cfg.diff_scale_factor

    def predict_frame_diff(
        self,
        params: Params,
        states: jnp.ndarray,
        position_ids: jnp.ndarray,
        frame_valid: jnp.ndarray,
        frame_idx,
        init_frame: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
        moe_aux: Optional[list] = None,
    ) -> jnp.ndarray:
        """Rollout hot path: full-window backbone, *single-frame* decode.

        The reference re-encodes the whole window and decodes every frame,
        then keeps only the last prediction (``model.py:161-166``).  The
        decoder acts per-frame, so decoding only ``frame_idx`` is exact and
        saves the MLPGNN grid pass over all other window frames — the
        dominant non-backbone cost at rollout time.

        ``init_frame``: optional (state, position_ids) to use as the
        see-init duplicated frame instead of ``states[:, 0]`` — needed by
        the right-aligned rollout window where the first *valid* frame is
        not at index 0.  When ``frame_idx`` is a python int, the decode
        slice is fully static.

        Returns the diff image for window frame ``frame_idx``: (bs, 3, X, Y).
        """
        cfg = self.cfg
        bs, seq_len, n_patch = states.shape[:3]
        if cfg.see_init_state:
            dup_s, dup_p = (
                init_frame if init_frame is not None
                else (states[:, 0], position_ids[:, 0])
            )
            states = jnp.concatenate([dup_s[:, None], states], axis=1)
            position_ids = jnp.concatenate([dup_p[:, None], position_ids], axis=1)
            frame_valid = jnp.concatenate(
                [jnp.ones((bs, 1), bool), frame_valid], axis=1
            )
            out_idx = frame_idx + 1  # drop the duplicated-frame prediction
            seq_len += 1
        else:
            out_idx = frame_idx

        h = input_embeddings_apply(
            params["input_emb"], states, position_ids, cfg.encoder_params,
            cfg.pos_embedding_params,
            spatial_scale=(self.ds_props.Nx_patch, self.ds_props.Ny_patch),
        )
        h = h.astype(self.backbone_cfg.dtype).reshape(bs, seq_len * n_patch, -1)
        token_valid = jnp.repeat(frame_valid, n_patch, axis=1)
        if cfg.use_bos_token:
            bos = jnp.broadcast_to(
                params["bos"].astype(h.dtype)[None, None, :], (bs, 1, h.shape[-1])
            )
            h = jnp.concatenate([bos, h], axis=1)
            token_valid = jnp.concatenate([jnp.ones((bs, 1), bool), token_valid], axis=1)

        # optional MXU tile padding (``FLUID_PAD_TOKENS=<multiple>``): append
        # INVALID tokens so L is a lane-friendly multiple.  Exact — padded
        # keys are masked out of attention, padded queries' outputs are never
        # read (the decode slice lies left of the padding), and cumsum
        # positions are unaffected for real tokens.
        import os

        pad_mult = int(os.environ.get("FLUID_PAD_TOKENS", "0"))
        if pad_mult:
            L = h.shape[1]
            npad = (-L) % pad_mult
            if npad:
                h = jnp.pad(h, ((0, 0), (0, npad), (0, 0)))
                token_valid = jnp.pad(token_valid, ((0, 0), (0, npad)))

        # final transformer block + decode restricted to the target frame's
        # token range (exact under causal attention; ``backbone.apply``).
        # MoE breaks the slice-exactness argument — expert capacity couples
        # tokens WITHIN a layer (a token's drop/keep depends on the other
        # tokens' routing), so the last block must see the full window —
        # run it dense and slice afterwards.
        if cfg.decoder_params.type == "CNN":
            # the CNN decoder's Conv1d spans the whole window's token stream
            # (raw-reshaped, ``patch_decoder.py:44-52``), so frames are not
            # decoded independently: run the backbone dense and decode the
            # FULL window, then keep the target frame (exactly the
            # reference's decode-everything-keep-last, ``model.py:161-166``).
            out = bb.apply(
                params["backbone"], self.backbone_cfg, h, token_valid,
                lora=params.get("lora"), lora_cfg=cfg.lora_config,
                moe_aux=moe_aux,
                moe_shardings=self._moe_shardings() if self.backbone_cfg.moe_experts > 0 else None,
            )
            if pad_mult and npad:
                out = out[:, :-npad]
            if cfg.use_bos_token:
                out = out[:, 1:]
            # invalid front frames (right-aligned rollout window) have no
            # reference counterpart (its deque only holds real frames, at a
            # different stream length): zero their tokens so the conv's
            # boundary leakage reads deterministic zeros, not stale state.
            # Exact once the window is full; documented in PARITY.md.
            out = jnp.where(
                jnp.repeat(frame_valid, n_patch, axis=1)[..., None], out, 0.0
            )
            all_tokens = out.reshape(bs, seq_len, n_patch, -1)
            preds = patch_decoder_apply(
                params["decoder"], all_tokens, self.ds_props, cfg.decoder_params
            )
            pred = jax.lax.dynamic_index_in_dim(preds, out_idx, 1, keepdims=False)
            pred = jnp.transpose(pred, (0, 3, 1, 2)).astype(jnp.float32)
            return pred * cfg.diff_scale_factor
        if self.backbone_cfg.moe_experts > 0:
            # notf/gen training rollouts run THROUGH this path — EP-sharded
            # MoE needs the expert constraints here just like forward()
            out = bb.apply(
                params["backbone"], self.backbone_cfg, h, token_valid,
                lora=params.get("lora"), lora_cfg=cfg.lora_config,
                moe_aux=moe_aux, moe_shardings=self._moe_shardings(),
            )
            tok_start = out_idx * n_patch + (1 if cfg.use_bos_token else 0)
            out = jax.lax.dynamic_slice_in_dim(out, tok_start, n_patch, axis=1)
        else:
            tok_start = jnp.asarray(out_idx, jnp.int32) * n_patch + (1 if cfg.use_bos_token else 0)
            out = bb.apply(
                params["backbone"], self.backbone_cfg, h, token_valid,
                lora=params.get("lora"), lora_cfg=cfg.lora_config,
                decode_slice=(tok_start, n_patch),
            )
        frame_tokens = out[:, None]  # (bs, 1, N, d)
        preds = patch_decoder_apply(
            params["decoder"], frame_tokens, self.ds_props, cfg.decoder_params
        )
        preds = jnp.transpose(preds[:, 0], (0, 3, 1, 2)).astype(jnp.float32)
        return preds * cfg.diff_scale_factor
