"""Typed, validated configuration with the same YAML surface as the reference.

The reference threads a flat YAML dict everywhere with no schema
(``src/utils.py:109-121``, ``configs/training1.yaml``).  Here the same keys are
parsed into a dataclass tree so typos fail loudly, while ``Config.from_yaml``
accepts reference config files unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import yaml


def _sub(cls, raw: Optional[dict], name: str):
    if raw is None:
        return cls()
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"Unknown keys in {name}: {sorted(unknown)}")
    return cls(**raw)


@dataclass
class LoraConfig:
    """LoRA/DoRA adapter settings (``configs/training1.yaml:9-14``)."""

    r: int = 16
    lora_alpha: float = 64
    lora_dropout: float = 0.1
    bias: str = "none"
    use_dora: bool = True
    # Which linear layers inside attention blocks get adapters.  The reference
    # relies on peft's per-model defaults (q/v projections for OPT).
    target_modules: Sequence[str] = ("q_proj", "v_proj")


@dataclass
class PosEmbeddingConfig:
    """``configs/training1.yaml:40-44``."""

    in_emb_ln_eps: Optional[float] = None
    input_emb_layer_dropout: Optional[float] = 0.1
    # "pos"/"rope" are the reference's modes; "rope_abs" is the TPU-native
    # cache-stable variant (static spatial scales, absolute time — required
    # by the streaming KV-cache serving path, ``rollout/streaming.py``)
    pos_embedding_type: str = "pos"  # "pos" | "rope" | "rope_abs"
    init_pos_embed: str = "normal"  # "normal" | "zero" | "scaled"

    def __post_init__(self):
        if self.pos_embedding_type not in ("pos", "rope", "rope_abs"):
            raise ValueError(f"pos_embedding_type: {self.pos_embedding_type}")
        if self.init_pos_embed not in ("normal", "zero", "scaled"):
            raise ValueError(f"init_pos_embed: {self.init_pos_embed}")


@dataclass
class EncoderConfig:
    """Patch-encoder settings (``configs/training1.yaml:47-51``)."""

    type: str = "MLP"  # "MLP" | "CNN"
    num_layers: int = 2
    hidden_dim: int = 512
    activation: str = "leakyrelu"


@dataclass
class DecoderConfig:
    """Patch-decoder settings (``configs/training1.yaml:54-61``).

    type "MLPGNN" is the reference default; "MLP" is the simple per-patch MLP;
    "CNN" is the Conv1d-over-tokens variant (``patch_decoder.py:22-30``).
    The reference's "MLP0"/"GNN" variants are dead/broken
    (``src/models/layers/GNN/decoders.py:52,102``) and intentionally omitted.
    """

    type: str = "MLPGNN"  # "MLP" | "CNN" | "MLPGNN"
    gnn_dim: int = 32
    gnn_hid_dim: int = 48
    gnn_layers: int = 3
    gnn_heads: int = 1
    mlp_hid_dim: int = 512
    dropout: float = 0.0
    # Only used by type == "MLP":
    num_layers: int = 2
    hidden_dim: int = 512
    activation: str = "leakyrelu"
    zero_last_layer: bool = False


@dataclass
class TeacherForcingConfig:
    """``configs/training1.yaml:64-67``; mode selection ``src/main.py:43-59``."""

    tf_mode: str = "gen"  # "gen" | "notf"
    tf_prob: float = 0.0
    start_epoch: int = 10000


@dataclass
class ParallelConfig:
    """TPU-native addition: device-mesh layout.  Not present in the reference
    (which is pure DDP via HF Accelerate, ``run_training.sh:5``)."""

    data_axis: int = -1  # -1: all devices on the data axis
    model_axis: int = 1  # tensor-parallel size for the backbone
    fsdp_axis: int = 1  # parameter/optimizer-state sharding size
    remat: bool = False  # jax.checkpoint the backbone blocks
    pipe_axis: int = 1  # pipeline stages over the backbone layers
    pipe_microbatches: int = 0  # 0: default 2 * pipe_axis
    seq_sharded_acts: bool = False  # Megatron-SP: tokens sharded over "model"
    #   between blocks (activation memory/bandwidth; needs model_axis > 1)
    ring_attention: bool = False  # context parallelism: K/V rotate around
    #   the "model" axis via ppermute instead of all-gathering for attention
    #   (parallel/ring_attention.py; requires seq_sharded_acts) — per-device
    #   attention memory O((L/n)^2), the scaling path for larger grids
    expert_axis: int = 1  # expert parallelism for MoE backbones (moe.experts)


@dataclass
class MoEConfig:
    """TPU-native addition: mixture-of-experts backbone MLPs (the reference's
    backbones are all dense).  ``experts: 0`` keeps the dense reference
    semantics; > 0 swaps every block's MLP for a top-k routed expert bank
    shardable over the ``expert`` mesh axis (``parallel.expert_axis``)."""

    experts: int = 0
    top_k: int = 1
    capacity_factor: float = 1.25
    aux_weight: float = 0.01  # Switch load-balance loss weight (topk router)
    router: str = "topk"  # "topk" (Switch/GShard) | "expert_choice"
    #   (experts pick their top-C tokens — capacity-exact, no balance loss)


@dataclass
class Config:
    task_name: str = "cylinder_task"

    # LLM params (``configs/training1.yaml:3-19``)
    llm_backbone: str = "facebook/opt-125m"
    llm_layers: int = -1
    llm_4bit_loading: bool = False
    freeze_llm: bool = False
    use_lora: bool = True
    lora_config: LoraConfig = field(default_factory=LoraConfig)
    half_precision: bool = True
    flash_attention: bool = True
    use_deepspeed: bool = False  # accepted for YAML parity; ZeRO == fsdp_axis
    use_bos_token: bool = True
    see_init_state: bool = True

    # Training params (``configs/training1.yaml:21-30``)
    batch_size: int = 8
    num_epochs: int = 260
    optimizer: str = "adamw"
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    loss_function: Sequence[str] = ("mae", "mse")
    loss_weighting: Sequence[float] = (0.1, 10.0)
    schedule_epoch: int = 50
    schedule_gamma: float = 0.75

    # Train modifications (``configs/training1.yaml:32-37``)
    pressure_weight: float = 0.1
    diff_scale_factor: float = 0.05
    loss_norm_eps: Optional[float] = 0.05
    channel_independent: bool = False
    noise: Optional[float] = None

    pos_embedding_params: PosEmbeddingConfig = field(default_factory=PosEmbeddingConfig)
    encoder_params: EncoderConfig = field(default_factory=EncoderConfig)
    decoder_params: DecoderConfig = field(default_factory=DecoderConfig)
    teacher_forcing: TeacherForcingConfig = field(default_factory=TeacherForcingConfig)

    # Dataloader params (``configs/training1.yaml:69-80``)
    autoreg_seq_len: int = 10
    val_seq_len: int = 26
    num_workers: int = 6
    load_dir: str = "synthetic"
    patch_size: Sequence[int] = (16, 16)
    stride: Sequence[int] = (16, 16)
    resolution: int = 238
    normalize_ds: bool = True
    seq_interval: int = 1
    seq_len: Optional[int] = None

    # Logging params (``configs/training1.yaml:82-87``)
    enable_wandb: bool = False
    save_on: bool = True
    save_model_each: int = 20
    checkpoint_save_path: str = "model_checkpoints"
    compile: bool = True  # accepted for parity; everything is jitted anyway

    # TPU-native additions
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    # Store FROZEN backbone weights in bf16 (reference parity: upstream
    # LOADS the backbone in torch bf16 and trains f32 adapters over it,
    # ``/root/reference/src/models/model.py:46-55`` — we default to f32
    # frozen masters instead; this opt-in halves the frozen backbone's HBM
    # footprint, e.g. for 7B-class adapter training).  Trainable params and
    # optimizer state stay f32 either way.
    frozen_bf16: bool = False
    # mixture-of-experts backbone variant (off by default — reference parity)
    moe: MoEConfig = field(default_factory=MoEConfig)
    # absolute trajectory-step time ids instead of the reference's
    # window-relative ones — the training-side requirement of the streaming
    # KV-cache serving path (``rollout/streaming.py``; needs ``rope_abs``
    # input embeddings so unbounded t stays well-defined)
    absolute_time_ids: bool = False
    seed: int = 1234  # reference seeds 1234 globally (``src/utils.py:23``)
    profile_dir: Optional[str] = None  # jax.profiler trace output, if set
    # write pred-vs-target comparison figures on validation epochs (the
    # reference only plots at inference, ``src/inference.py:65-77``)
    val_plot_dir: Optional[str] = None
    # gradient accumulation (the reference's ``accelerator.accumulate``,
    # ``src/main.py:68``); 1 = update every step
    grad_accum_steps: int = 1

    def __post_init__(self):
        if isinstance(self.lora_config, dict):
            self.lora_config = _sub(LoraConfig, self.lora_config, "lora_config")
        if isinstance(self.pos_embedding_params, dict):
            self.pos_embedding_params = _sub(
                PosEmbeddingConfig, self.pos_embedding_params, "pos_embedding_params"
            )
        if isinstance(self.encoder_params, dict):
            self.encoder_params = _sub(EncoderConfig, self.encoder_params, "encoder_params")
        if isinstance(self.decoder_params, dict):
            self.decoder_params = _sub(DecoderConfig, self.decoder_params, "decoder_params")
        if isinstance(self.teacher_forcing, dict):
            self.teacher_forcing = _sub(
                TeacherForcingConfig, self.teacher_forcing, "teacher_forcing"
            )
        if isinstance(self.parallel, dict):
            self.parallel = _sub(ParallelConfig, self.parallel, "parallel")
        if isinstance(self.moe, dict):
            self.moe = _sub(MoEConfig, self.moe, "moe")
        self.learning_rate = float(self.learning_rate)
        self.weight_decay = float(self.weight_decay)
        self.patch_size = tuple(int(p) for p in self.patch_size)
        self.stride = tuple(int(s) for s in self.stride)
        if self.patch_size != self.stride:
            raise ValueError("Only non-overlapping patches are supported (patch_size == stride)")
        if self.optimizer not in ("adamw", "adam", "sgd", "adafactor"):
            raise ValueError(f"Unknown optimizer {self.optimizer}")
        for fn in self.loss_function:
            if fn not in ("mse", "rmse", "mae", "mape", "smape"):
                raise ValueError(f"Unknown loss function {fn}")
        if len(self.loss_function) != len(self.loss_weighting):
            raise ValueError("loss_function and loss_weighting length mismatch")
        if (
            self.absolute_time_ids
            and self.pos_embedding_params.pos_embedding_type != "rope_abs"
        ):
            raise ValueError(
                "absolute_time_ids needs pos_embedding_type: rope_abs (the "
                "learned t-table is bounded and 'rope' renormalises by batch max)"
            )

    # -- YAML interface -----------------------------------------------------

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known - {"gen_seq_len"}  # vestigial reference key
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        return cls(**{k: v for k, v in raw.items() if k in known})

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
