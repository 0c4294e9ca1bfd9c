"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2.4: "Pipeline
parallel: No" — the backbone is loaded whole per process,
``/root/reference/src/models/model.py:46-55``).  This module goes beyond
parity: it splits the backbone's transformer blocks into contiguous
STAGES sharded over a ``pipe`` mesh axis and streams microbatches through
them with ``lax.ppermute`` hops over ICI.

TPU-native design (not a port of any torch pipeline engine):

- stage weights = the ``stack_layers`` layout (leaves with a leading
  ``n_layers`` axis) sharded ``P("pipe")`` on that axis — each device
  holds ``n_layers / S`` contiguous blocks, an ordinary sharded pytree
  that Orbax checkpointing, ``cast_matmul_params`` and quantization all
  compose with unchanged;
- the schedule is ONE ``lax.scan`` over ``M + S - 1`` ticks inside
  ``jax.shard_map`` (manual over ``pipe`` only — ``data``/``fsdp``/
  ``model`` axes stay automatic, so PP composes with the existing DP/
  ZeRO/TP shardings of ``parallel/mesh.py``);
- each tick every stage runs its local blocks on its current microbatch
  and hands the activation to the next stage via a single neighbour
  ``ppermute`` (pure ICI traffic, no host involvement);
- gradients flow through the schedule with plain ``jax.grad``: the
  transpose of ``ppermute`` is the reverse hop, so the backward pass is
  the mirrored pipeline with no extra machinery.

Scope (documented restrictions, enforced loudly): the pipelined path is
the stacked-layer inference/full-finetune layout — per-layer LoRA trees
and in-backbone dropout are not supported (same restriction as
``backbone.apply``'s scan path; merge adapters or train full-FT).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluid_llm_tpu.models import backbone as bb

PIPE_AXIS = "pipe"


def stage_count(mesh: Mesh) -> int:
    return dict(mesh.shape).get(PIPE_AXIS, 1)


def shard_pipeline_params(params, mesh: Mesh, fsdp: bool = False,
                          tp: bool = False):
    """Place stacked backbone params on a pipe mesh (layer axis split over
    ``pipe``; trailing dims optionally fsdp/tp-sharded as usual)."""
    from fluid_llm_tpu.parallel.mesh import backbone_param_specs

    if isinstance(params["layers"], list):
        raise ValueError("pipeline needs the stacked layout — call "
                         "backbone.stack_layers first")
    specs = backbone_param_specs(params, fsdp, tp, pp=True)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def apply_pipelined(
    params,
    cfg: bb.BackboneConfig,
    inputs_embeds: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    n_microbatches: int = 0,
    remat: bool = True,
) -> jnp.ndarray:
    """Pipelined twin of ``backbone.apply`` for the stacked layout.

    Semantics match ``apply(stacked_params, ...)`` exactly (same blocks,
    same masks); only the layer loop is distributed.  ``n_microbatches``
    defaults to ``2 * n_stages`` (bubble fraction (S-1)/(M+S-1)); the
    batch must divide evenly.
    """
    S = stage_count(mesh)
    if cfg.n_layers % S != 0:
        raise ValueError(f"{cfg.n_layers} layers not divisible by {S} stages")
    if isinstance(params["layers"], list):
        raise ValueError("pipeline needs the stacked layout — call "
                         "backbone.stack_layers first")
    per_stage = cfg.n_layers // S

    bs, L = inputs_embeds.shape[:2]
    M = n_microbatches or 2 * S
    if bs % M != 0:
        raise ValueError(f"batch {bs} not divisible by {M} microbatches")
    mb = bs // M

    x = inputs_embeds.astype(cfg.dtype)
    if valid is None:
        valid = jnp.ones((bs, L), bool)
    positions, _ = bb.make_masks(valid)

    # pre-stage work (replicated over pipe; sharded over data/fsdp as usual)
    if "project_in" in params:
        x = bb._linear(x, params["project_in"])
    if cfg.pos == "learned":
        x = x + params["pos_embed"][positions + cfg.pos_offset].astype(cfg.dtype)

    # f32 for the same reason as the output psum: the cotangent of a
    # pipe-replicated input is psum-reduced on the backward pass, and a
    # bf16 all-reduce crashes the XLA CPU backend used by the test mesh
    # (cast back to cfg.dtype at use — exact for bf16 values)
    xs = x.astype(jnp.float32).reshape(M, mb, L, -1)
    valid_mb = valid.reshape(M, mb, L)

    def stages_fn(layers_local, xs, valid_mb):
        s = jax.lax.axis_index(PIPE_AXIS)

        def run_stage(x_in, v_in):
            positions, allowed = bb.make_masks(v_in)

            def scan_block(h, li):
                return (
                    bb._block_stacked(h, layers_local, li, cfg, positions,
                                      allowed, v_in),
                    None,
                )

            body = jax.checkpoint(scan_block) if remat else scan_block
            out, _ = jax.lax.scan(body, x_in, jnp.arange(per_stage))
            return out

        def tick(carry, t):
            state, outputs = carry
            j = t - s  # microbatch this stage works on at tick t
            jc = jnp.clip(j, 0, M - 1)
            # stage 0 ingests a fresh microbatch; later stages use the
            # activation received from the previous stage last tick
            fresh = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0,
                                                 keepdims=False)
            x_in = jnp.where(s == 0, fresh.astype(cfg.dtype), state)
            v_in = jax.lax.dynamic_index_in_dim(valid_mb, jc, 0, keepdims=False)
            y = run_stage(x_in, v_in)
            # the last stage commits finished microbatches (bubble ticks
            # where j is out of range write nothing)
            write = (s == S - 1) & (j >= 0) & (j < M)
            prev = jax.lax.dynamic_index_in_dim(outputs, jc, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, y, prev), jc, 0
            )
            # hand the activation to the next stage (one ICI hop)
            state = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            return (state, outputs), None

        init = (jnp.zeros((mb, L, x.shape[-1]), cfg.dtype),
                jnp.zeros((M, mb, L, x.shape[-1]), cfg.dtype))
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # replicate the last stage's outputs across the pipe axis.  The sum
        # has one non-zero term per element so f32 is exact; it also dodges
        # an XLA CPU AllReducePromotion crash on 16-bit all-reduces
        # ("Invalid binary instruction opcode copy") hit by bf16 models on
        # the virtual test mesh.
        outputs = jax.lax.psum(
            jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs))
            .astype(jnp.float32),
            PIPE_AXIS,
        )
        return outputs.astype(cfg.dtype)

    layer_specs = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS),
                                         params["layers"])
    out = jax.shard_map(
        stages_fn,
        mesh=mesh,
        in_specs=(layer_specs, P(), P()),
        out_specs=P(),
        axis_names={PIPE_AXIS},
        check_vma=False,
    )(params["layers"], xs, valid_mb)
    x = out.reshape(bs, L, -1)

    # post-stage work (replicated over pipe)
    if cfg.final_ln:
        x = bb._norm(x, params["final_norm"], cfg)
    if "project_out" in params:
        x = bb._linear(x, params["project_out"])
    return x
