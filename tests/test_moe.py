"""Mixture-of-experts backbone variant (TPU-native addition — every
reference backbone is dense, ``/root/reference/src/models/model.py:35-36``):
routing math vs a numpy oracle, dense-MLP parity, expert parallelism on the
virtual 8-device mesh, trainer aux-loss integration, and the guard rails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.config import Config, ParallelConfig
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.parallel.mesh import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)
from fluid_llm_tpu.train.optim import partition
from fluid_llm_tpu.train.trainer import Trainer

from test_model import TINY, tiny_setup


def moe_setup(**moe_kw):
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    moe = {"experts": 4, "top_k": 2, "capacity_factor": 8.0}
    moe.update(moe_kw)
    cfg = cfg.replace(moe=moe)
    return cfg, ds, props, FluidLLM.build(cfg, props, **TINY), batch


def test_identical_experts_match_dense():
    """With every expert initialised to the dense MLP's weights and ample
    capacity, the routed mixture equals the dense backbone exactly
    (gates sum to 1)."""
    cfg_d, ds, props, dense, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg_m, _, _, moe, _ = moe_setup()

    pd = dense.init(jax.random.PRNGKey(0))
    pm = moe.init(jax.random.PRNGKey(0))
    # align every non-MLP param; broadcast the dense MLP into all experts
    for li, (ld, lm) in enumerate(
        zip(pd["backbone"]["layers"], pm["backbone"]["layers"])
    ):
        for name in ("fc1", "fc2"):
            for leaf in ("w", "b"):
                E = lm["mlp"]["experts"][name][leaf].shape[0]
                lm["mlp"]["experts"][name][leaf] = jnp.broadcast_to(
                    ld["mlp"][name][leaf][None], (E,) + ld["mlp"][name][leaf].shape
                )
        for k in ("ln1", "ln2", "attn"):
            lm[k] = ld[k]
    for k in pd["backbone"]:
        if k != "layers":
            pm["backbone"][k] = pd["backbone"][k]
    for k in pd:
        if k != "backbone":
            pm[k] = pd[k]

    states, _, _, _, pos = batch
    o_m = moe.forward(pm, states, pos)
    o_d = dense.forward(pd, states, pos)
    np.testing.assert_allclose(np.asarray(o_m), np.asarray(o_d), atol=1e-6)


def test_routing_matches_numpy_oracle():
    """Top-1 routed output == per-token numpy loop: gate prob × expert FFN of
    the argmax expert (ample capacity)."""
    cfg = bb.BackboneConfig(
        family="opt", n_layers=1, d_model=8, n_heads=2, d_ff=16,
        moe_experts=2, moe_top_k=1, moe_capacity_factor=100.0,
    )
    p = bb._moe_init(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8), jnp.float32)
    out, aux = bb._moe_mlp(h, p, cfg)

    hn = np.asarray(h)
    wr = np.asarray(p["router"]["w"])
    w1, b1 = np.asarray(p["experts"]["fc1"]["w"]), np.asarray(p["experts"]["fc1"]["b"])
    w2, b2 = np.asarray(p["experts"]["fc2"]["w"]), np.asarray(p["experts"]["fc2"]["b"])
    want = np.zeros_like(hn)
    for b in range(2):
        for l in range(6):
            logits = hn[b, l] @ wr
            probs = np.exp(logits - logits.max())
            probs = probs / probs.sum()
            e = int(np.argmax(probs))
            y = np.maximum(hn[b, l] @ w1[e] + b1[e], 0.0)  # relu
            want[b, l] = probs[e] * (y @ w2[e] + b2[e])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    assert np.isfinite(float(aux))


def test_expert_choice_matches_numpy_oracle():
    """expert_choice routing == per-expert numpy top-C loop: each expert
    takes its top-C tokens by softmax affinity and contributes
    gate * FFN_e(token); unpicked tokens get zero (residual carries them).
    Every expert runs exactly full — capacity-exact by construction."""
    cfg = bb.BackboneConfig(
        family="opt", n_layers=1, d_model=8, n_heads=2, d_ff=16,
        moe_experts=2, moe_top_k=1, moe_capacity_factor=2.0,
        moe_router="expert_choice",
    )
    p = bb._moe_init(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8), jnp.float32)
    out, aux = bb._moe_mlp(h, p, cfg)
    assert float(aux) == 0.0  # no balance loss needed

    L, E = 6, 2
    C = 6  # ceil(2.0 * 1 * 6 / 2)
    hn = np.asarray(h)
    wr = np.asarray(p["router"]["w"])
    w1, b1 = np.asarray(p["experts"]["fc1"]["w"]), np.asarray(p["experts"]["fc1"]["b"])
    w2, b2 = np.asarray(p["experts"]["fc2"]["w"]), np.asarray(p["experts"]["fc2"]["b"])
    want = np.zeros_like(hn)
    for b in range(2):
        logits = hn[b] @ wr  # (L, E)
        ex = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = ex / ex.sum(axis=-1, keepdims=True)
        for e in range(E):
            top = np.argsort(-probs[:, e])[:C]
            for l in top:
                y = np.maximum(hn[b, l] @ w1[e] + b1[e], 0.0)
                want[b, l] += probs[l, e] * (y @ w2[e] + b2[e])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_expert_choice_trains_end_to_end():
    """expert_choice MoE through the trainer: finite loss, zero aux, router
    and experts receive gradients."""
    cfg, ds, props, model, batch = moe_setup(router="expert_choice")
    assert model.backbone_cfg.moe_router == "expert_choice"
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r0 = np.asarray(
        state.trainable["backbone"]["layers"][0]["mlp"]["router"]["w"]
    )
    tr, _, m = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(m["loss"]))
    assert float(m["moe_aux"]) == 0.0
    assert not np.allclose(
        np.asarray(tr["backbone"]["layers"][0]["mlp"]["router"]["w"]), r0
    )


@pytest.mark.parametrize("router", ["topk", "expert_choice"])
def test_invalid_tokens_do_not_route(router):
    """Padding exactness at TIGHT capacity: appending masked tokens must not
    change valid tokens' outputs — invalid tokens must neither consume
    expert capacity (topk cumsum runs in token order) nor displace real
    tokens from an expert's top-C (expert_choice)."""
    cfg = bb.BackboneConfig(
        family="opt", n_layers=1, d_model=8, n_heads=2, d_ff=16,
        moe_experts=2, moe_top_k=1, moe_capacity_factor=1.0,
        moe_router=router, dropout=0.0,
    )
    p = bb._moe_init(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8), jnp.float32)

    out_ref, _ = bb._moe_mlp(h, p, cfg, valid=jnp.ones((2, 6), bool))

    # pad with garbage tokens marked invalid — at the FRONT, like the
    # rollout window's empty slots (worst case for the cumsum ordering)
    pad = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8), jnp.float32) * 3
    h_pad = jnp.concatenate([pad, h], axis=1)
    valid = jnp.asarray(np.arange(11)[None, :] >= 5).repeat(2, 0)
    # capacity stays based on the real token count (as the model threads it
    # for its padding paths) — otherwise padding would inflate C
    out_pad, aux_pad = bb._moe_mlp(h_pad, p, cfg, valid=valid, capacity_tokens=6)

    np.testing.assert_allclose(
        np.asarray(out_pad[:, 5:]), np.asarray(out_ref), atol=1e-5,
        err_msg=f"router={router}",
    )
    assert np.isfinite(float(aux_pad))


def test_capacity_drops_tokens():
    """Zero router logits send every token to expert 0; with capacity 1 only
    the first token per sequence gets an MLP contribution — the rest pass
    through as zeros (Switch drop semantics)."""
    cfg = bb.BackboneConfig(
        family="opt", n_layers=1, d_model=8, n_heads=2, d_ff=16,
        moe_experts=2, moe_top_k=1, moe_capacity_factor=1e-6,
    )
    p = bb._moe_init(jax.random.PRNGKey(0), cfg)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8), jnp.float32)
    out, _ = bb._moe_mlp(h, p, cfg)
    out = np.asarray(out)
    assert np.abs(out[:, 0]).max() > 0.0
    np.testing.assert_array_equal(out[:, 1:], 0.0)


def test_expert_param_specs():
    cfg, ds, props, model, _ = moe_setup()
    params = model.init(jax.random.PRNGKey(0))
    specs = param_specs(params, ParallelConfig(expert_axis=2))
    mlp_spec = specs["backbone"]["layers"][0]["mlp"]
    assert mlp_spec["experts"]["fc1"]["w"][0] == "expert"
    assert mlp_spec["experts"]["fc2"]["b"][0] == "expert"
    assert mlp_spec["router"]["w"] == ()


def test_expert_parallel_matches_single_device():
    """Train step on the data=4 x expert=2 mesh == unsharded step."""
    cfg, ds, props, model, batch = moe_setup()
    batch8 = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)

    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0, _, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch8, jax.random.PRNGKey(1)
    )

    par = ParallelConfig(expert_axis=2)
    mesh = make_mesh(par)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 1, "model": 1, "expert": 2}
    full = model.init(jax.random.PRNGKey(0))
    full = shard_params(full, mesh, par)
    tr, fr = partition(full, model.trainable_mask(full))
    opt2 = trainer.opt.init(tr)
    sharded = shard_batch(batch8, mesh)
    t1, _, m1 = trainer.train_step_autoreg(
        tr, fr, opt2, sharded, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m0["moe_aux"]), float(m1["moe_aux"]), rtol=1e-5
    )


def test_expert_plus_tensor_parallel_matches_single_device():
    """EP composes with TP: experts' leading axis over "expert", their
    col/row dims over "model" (data=2 x model=2 x expert=2) == unsharded."""
    cfg, ds, props, model, batch = moe_setup()
    batch8 = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)

    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    _, _, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch8, jax.random.PRNGKey(1)
    )

    par = ParallelConfig(model_axis=2, expert_axis=2)
    mesh = make_mesh(par)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 1, "model": 2, "expert": 2}
    full = shard_params(model.init(jax.random.PRNGKey(0)), mesh, par)
    tr, fr = partition(full, model.trainable_mask(full))
    ex = tr["backbone"]["layers"][0]["mlp"]["experts"]
    assert ex["fc1"]["w"].sharding.spec == ("expert", None, "model")
    assert ex["fc2"]["w"].sharding.spec == ("expert", "model", None)
    _, _, m1 = trainer.train_step_autoreg(
        tr, fr, trainer.opt.init(tr), shard_batch(batch8, mesh),
        jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)


def test_expert_plus_fsdp_matches_single_device():
    """EP composes with fsdp: experts shard ("expert", "fsdp", ...) —
    leading axis over experts, weight rows ZeRO-style over fsdp."""
    cfg, ds, props, model, batch = moe_setup()
    batch8 = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    _, _, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch8, jax.random.PRNGKey(1)
    )
    par = ParallelConfig(fsdp_axis=2, expert_axis=2)
    mesh = make_mesh(par)
    full = shard_params(model.init(jax.random.PRNGKey(0)), mesh, par)
    tr, fr = partition(full, model.trainable_mask(full))
    assert tr["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"] \
        .sharding.spec == ("expert", "fsdp", None)
    _, _, m1 = trainer.train_step_autoreg(
        tr, fr, trainer.opt.init(tr), shard_batch(batch8, mesh),
        jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)


def test_train_step_reports_and_trains_moe():
    """Aux loss lands in the metrics; router and expert weights get grads."""
    cfg, ds, props, model, batch = moe_setup()
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r0 = np.asarray(
        state.trainable["backbone"]["layers"][0]["mlp"]["router"]["w"]
    )
    e0 = np.asarray(
        state.trainable["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"]
    )
    tr, _, metrics = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["moe_aux"]))
    assert not np.allclose(
        np.asarray(tr["backbone"]["layers"][0]["mlp"]["router"]["w"]), r0
    )
    assert not np.allclose(
        np.asarray(tr["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"]), e0
    )


def test_gen_mode_runs_with_moe():
    """gen mode with MoE: the stop-gradient guide rollout (dense final
    block) + the aux-collected correction forward both run; aux lands."""
    cfg, ds, props, model, batch = moe_setup()
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    _, _, m = trainer.train_step_gen(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(m["loss"]))
    assert "moe_aux" in m and float(m["moe_aux"]) > 0.0


def test_notf_mode_collects_rollout_aux():
    """The notf mode's gradient-bearing forward is the rollout itself — its
    router load-balance aux must land in the metrics (review finding: it
    was silently dropped because the scan could not feed the python-list
    collector)."""
    cfg, ds, props, model, batch = moe_setup()
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    r0 = np.asarray(
        state.trainable["backbone"]["layers"][0]["mlp"]["router"]["w"]
    )
    tr, _, m = trainer.train_step_notf(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(m["loss"]))
    assert "moe_aux" in m and np.isfinite(float(m["moe_aux"]))
    assert float(m["moe_aux"]) > 0.0
    # the aux term carries router gradients through the rollout
    assert not np.allclose(
        np.asarray(tr["backbone"]["layers"][0]["mlp"]["router"]["w"]), r0
    )


def test_rollout_uses_dense_final_block():
    """MoE rollouts must not use the decode slice (capacity couples tokens
    within a layer): gen_seq on a MoE model equals a manual full forward's
    last-frame diff at ample capacity, and the sliced backbone path raises."""
    cfg, ds, props, model, batch = moe_setup()
    from fluid_llm_tpu.rollout.generate import gen_seq

    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos = batch
    # one predicted step from the full window: rollout vs dense oracle
    imgs, diffs = gen_seq(model, params, batch, states.shape[1])
    assert np.isfinite(np.asarray(imgs)).all()

    with pytest.raises(NotImplementedError, match="decode_slice"):
        bbcfg = model.backbone_cfg
        p = params["backbone"]
        L = 4 * props.N_patch
        h = jnp.zeros((1, L, bbcfg.d_model))
        bb.apply(p, bbcfg, h, decode_slice=(jnp.int32(0), props.N_patch))


def test_cast_frozen_bf16_skips_quantized_storage():
    """frozen_bf16 + quantized backbone: the int8 'q' bytes and their f32
    scale chain pass through untouched (scales carry the dynamic range)."""
    from fluid_llm_tpu.ops.quant import quantize_weight
    from fluid_llm_tpu.train.trainer import cast_frozen_bf16

    w = jax.random.normal(jax.random.PRNGKey(0), (8, 8), jnp.float32)
    frozen = {"backbone": {"layers": [
        {"attn": {"q": quantize_weight(w)}, "ln1": {"w": jnp.ones((8,))}}
    ]}}
    out = cast_frozen_bf16(frozen)
    qp = out["backbone"]["layers"][0]["attn"]["q"]
    assert qp["q"].dtype == jnp.int8
    assert qp["scale"].dtype == jnp.float32
    assert out["backbone"]["layers"][0]["ln1"]["w"].dtype == jnp.bfloat16


def test_moe_guards():
    cfg, ds, props, model, _ = moe_setup()
    # pipeline + MoE rejected at build time
    with pytest.raises(ValueError, match="pipe_axis"):
        FluidLLM.build(
            cfg.replace(parallel={"pipe_axis": 2}), props, **TINY
        )
    # stacked layout refuses MoE layers (keeps the unrolled path)
    params = model.init(jax.random.PRNGKey(0))
    assert isinstance(bb.stack_layers(params["backbone"])["layers"], list)
    # LoRA targets addressing the dense MLP fail loudly on a MoE backbone
    from fluid_llm_tpu.models.lora import LoraConfig, init_lora

    with pytest.raises(ValueError, match="MoE"):
        init_lora(
            jax.random.PRNGKey(0), params["backbone"],
            LoraConfig(r=2, lora_alpha=4, target_modules=("q_proj", "fc1")),
        )
    # top_k > experts would double-dispatch expert 0 with an un-zeroed gate
    with pytest.raises(ValueError, match="top_k"):
        FluidLLM.build(cfg.replace(moe={"experts": 2, "top_k": 3}), props, **TINY)
    # experts must divide the expert mesh axis
    with pytest.raises(ValueError, match="expert_axis"):
        FluidLLM.build(
            cfg.replace(moe={"experts": 3, "top_k": 1},
                        parallel={"expert_axis": 2}),
            props, **TINY,
        )


def test_moe_sharded_checkpoint_resume(tmp_path):
    """EP-sharded MoE train -> save -> restore into the expert-sharded
    template -> one more sharded step (the continue_train path must rebuild
    the expert mesh and land the stacked (E, ...) weights back on it)."""
    from jax.sharding import NamedSharding

    from fluid_llm_tpu.main import finish_state
    from fluid_llm_tpu.train import checkpoint as ckpt

    cfg, ds, props, model, batch = moe_setup()
    par = ParallelConfig(expert_axis=2)
    cfg = cfg.replace(parallel=par)
    batch8 = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)
    trainer = Trainer(model)

    params = model.init(jax.random.PRNGKey(0))
    state, mesh = finish_state(params, model, trainer, cfg)
    assert mesh is not None and "expert" in mesh.axis_names

    sharded_batch = shard_batch(batch8, mesh)
    state.trainable, state.opt_state, m = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, sharded_batch,
        jax.random.PRNGKey(1),
    )
    state.epoch = 1
    ckpt.save_checkpoint(str(tmp_path), 1, state, cfg)

    params2 = model.init(jax.random.PRNGKey(9))
    like, mesh2 = finish_state(params2, model, trainer, cfg)
    restored = ckpt.restore_checkpoint(str(tmp_path), 1, like)
    ex = restored.trainable["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"]
    assert isinstance(ex.sharding, NamedSharding)
    assert ex.sharding.spec[0] == "expert"

    # value parity vs an unsharded restore, then one more step runs
    like_plain = trainer.init_state(jax.random.PRNGKey(9))
    restored_plain = ckpt.restore_checkpoint(str(tmp_path), 1, like_plain)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.trainable)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored_plain.trainable)[0]),
    )
    _, _, m2 = trainer.train_step_autoreg(
        restored.trainable, restored.frozen, restored.opt_state, sharded_batch,
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m2["loss"]))


def test_moe_streaming_equals_banded_dense():
    """MoE composes with KV-cache streaming: apply_streaming stepped
    frame-by-frame (ring eviction active) == one dense apply under the
    banded mask.  Routing is per-token, so with ample capacity (no drops on
    either formulation) the equality is exact, same as the dense-backbone
    oracle in test_streaming.py."""
    from test_streaming import _token_stream, llama_setup

    cfg, ds, model, batch = llama_setup(
        moe={"experts": 4, "top_k": 2, "capacity_factor": 8.0}
    )
    bcfg = model.backbone_cfg
    assert bcfg.moe_experts == 4
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos_ids = batch
    bs, T, n_patch = states.shape[:3]
    R = 3  # ring of 3 frames while T=5 -> frames 3,4 evict 0,1

    x, positions, frame_of = _token_stream(model, params, states, pos_ids)
    n_sink = 1 + n_patch

    cache = bb.init_streaming_cache(bcfg, bs, n_sink, R, n_patch)
    _, cache = bb.apply_streaming(
        params["backbone"], bcfg, x[:, :n_sink], positions[:n_sink], cache, 0,
        prefill=True,
    )
    stream_out = []
    for f in range(T):
        lo = n_sink + f * n_patch
        y, cache = bb.apply_streaming(
            params["backbone"], bcfg, x[:, lo:lo + n_patch],
            positions[lo:lo + n_patch], cache, f % R,
        )
        stream_out.append(np.asarray(y))

    qf = frame_of[:, None]
    kf = frame_of[None, :]
    causal = np.asarray(positions)[:, None] >= np.asarray(positions)[None, :]
    in_band = (kf == -1) | (kf > qf - R)
    allowed = jnp.asarray(causal & in_band)[None, None]
    pos_b = jnp.broadcast_to(positions[None, :], (bs, x.shape[1]))
    dense = bb.apply(
        params["backbone"], bcfg, x,
        positions_override=pos_b, allowed_override=allowed,
    )

    for f in range(T):
        lo = n_sink + f * n_patch
        np.testing.assert_allclose(
            stream_out[f], np.asarray(dense[:, lo:lo + n_patch]),
            atol=2e-5, rtol=1e-5, err_msg=f"frame {f}",
        )
