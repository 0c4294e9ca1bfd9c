"""int8 weight-only quantization: round-trip accuracy + model forward path."""

import jax
import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.ops.quant import (
    dequantize_backbone,
    quantization_error,
    quantize_backbone,
    quantize_weight,
)

from test_model import tiny_setup


def test_quantize_round_trip(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.1
    qp = quantize_weight(w)
    assert qp["q"].dtype == jnp.int8
    rec = qp["q"].astype(jnp.float32) * qp["scale"]
    # absmax-symmetric int8: error bounded by scale/2 per column
    err = jnp.abs(rec - w)
    assert float(jnp.max(err / jnp.maximum(qp["scale"], 1e-12))) <= 0.5 + 1e-3


def test_quantized_backbone_forward_close():
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    ref = model.forward(params, states, pos)

    qparams = dict(params)
    qparams["backbone"] = quantize_backbone(params["backbone"])
    out = model.forward(qparams, states, pos)
    # int8 weights perturb outputs slightly but boundedly
    denom = float(jnp.std(ref)) + 1e-9
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.35, rel
    assert np.isfinite(np.asarray(out)).all()

    # dequantize round-trips the structure
    deq = dequantize_backbone(qparams["backbone"], jnp.float32)
    w0 = params["backbone"]["layers"][0]["attn"]["q"]["w"]
    w1 = deq["layers"][0]["attn"]["q"]["w"]
    assert w1.shape == w0.shape
    assert quantization_error(params["backbone"]) <= 0.51


def test_nf4_pack_roundtrip_exact():
    """Packing/unpacking of 4-bit codes is lossless."""
    import numpy as np

    from fluid_llm_tpu.ops.quant import NF4_CODEBOOK, dequantize_weight_nf4, quantize_weight_nf4

    rng = np.random.default_rng(0)
    # weights already ON codebook points times a block absmax: exact recovery
    codes = rng.integers(0, 16, size=(8, 16))
    w = NF4_CODEBOOK[codes].astype(np.float32) * 0.37
    qp = quantize_weight_nf4(jnp.asarray(w))
    assert qp["codes"].dtype == jnp.uint8 and qp["codes"].shape == (8, 8)
    rec = np.asarray(dequantize_weight_nf4(qp, jnp.float32))
    np.testing.assert_allclose(rec, w, rtol=2e-2, atol=1e-3)


def test_nf4_error_bounds_normal_weights():
    import numpy as np

    from fluid_llm_tpu.ops.quant import dequantize_weight_nf4, quantize_weight_nf4

    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.02
    qp = quantize_weight_nf4(jnp.asarray(w))
    rec = np.asarray(dequantize_weight_nf4(qp, jnp.float32))
    rel = np.abs(rec - w).mean() / np.abs(w).mean()
    # 4-bit NormalFloat on normal weights: ~7% mean relative error
    assert rel < 0.12, rel
    # storage really is ~4 bit + overhead
    bytes_used = qp["codes"].size + qp["absmax_q"].size + 4 * qp["absmax_scale"].size + 4
    assert bytes_used < w.size * 0.7


def test_nf4_backbone_forward_close():
    """nf4-quantized backbone forward stays close to the float forward."""
    import numpy as np

    from fluid_llm_tpu.models import backbone as bb
    from fluid_llm_tpu.ops.quant import quantize_backbone

    cfg = bb.BackboneConfig(
        family="opt", n_layers=2, d_model=64, n_heads=4, d_ff=128,
        max_pos=64, act="relu", pos="learned", pos_offset=2, dropout=0.0,
        attn_impl="xla",
    )
    params = bb.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 64), jnp.float32) * 0.3
    ref = np.asarray(bb.apply(params, cfg, x))
    qparams = quantize_backbone(params, mode="nf4")
    # check it actually stored 4-bit
    assert "codes" in qparams["layers"][0]["attn"]["q"]["w"]
    out = np.asarray(bb.apply(qparams, cfg, x))
    err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.25, err


def test_quantized_backbone_shards_over_mesh():
    """Quantization composes with the device mesh (VERDICT r1 #10)."""
    import numpy as np
    from jax.sharding import NamedSharding

    from fluid_llm_tpu.config import ParallelConfig
    from fluid_llm_tpu.models import backbone as bb
    from fluid_llm_tpu.ops.quant import quantize_backbone
    from fluid_llm_tpu.parallel.mesh import make_mesh, shard_params

    cfg = bb.BackboneConfig(
        family="opt", n_layers=2, d_model=64, n_heads=4, d_ff=128,
        max_pos=64, act="relu", pos="learned", pos_offset=2, dropout=0.0,
        attn_impl="xla",
    )
    params = {"backbone": quantize_backbone(
        bb.init_params(jax.random.PRNGKey(0), cfg), mode="int8")}
    par = ParallelConfig(model_axis=2, fsdp_axis=2)
    mesh = make_mesh(par)
    sharded = shard_params(params, mesh, par)
    q = sharded["backbone"]["layers"][0]["attn"]["q"]["w"]["q"]
    assert isinstance(q.sharding, NamedSharding)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 64), jnp.float32)
    out = bb.apply(sharded["backbone"], cfg, x)
    assert np.isfinite(np.asarray(out)).all()

    # nf4 storage also places (replicated packed bytes)
    params4 = {"backbone": quantize_backbone(
        bb.init_params(jax.random.PRNGKey(0), cfg), mode="nf4")}
    sharded4 = shard_params(params4, mesh, par)
    out4 = bb.apply(sharded4["backbone"], cfg, x)
    assert np.isfinite(np.asarray(out4)).all()


def test_int8_quantizes_stacked_expert_banks():
    """(E, in, out) expert stacks quantize per expert slice (int8, per-
    output-column scales) and round-trip within int8 error; 2-D behaviour
    is unchanged by the generalisation."""
    from fluid_llm_tpu.ops.quant import dequantize_weight, quantize_weight

    w = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 8), jnp.float32) * 0.1
    qp = quantize_weight(w)
    assert qp["q"].shape == (4, 16, 8) and qp["scale"].shape == (4, 8)
    deq = np.asarray(dequantize_weight(qp, jnp.float32))
    np.testing.assert_allclose(deq, np.asarray(w), atol=float(np.abs(w).max()) / 127)
    # each expert's scales equal quantizing that slice alone
    solo = quantize_weight(w[2])
    np.testing.assert_allclose(np.asarray(qp["scale"][2]), np.asarray(solo["scale"]))


def test_moe_int8_forward_close_and_ep_shardable():
    """MoE backbone with int8-quantized expert banks: forward close to the
    float model, and the quantized storage shards its leading axis over the
    expert mesh axis."""
    import sys

    sys.path.insert(0, "tests")
    from test_moe import moe_setup

    from fluid_llm_tpu.config import ParallelConfig
    from fluid_llm_tpu.ops.quant import quantize_backbone
    from fluid_llm_tpu.parallel.mesh import make_mesh, param_specs, shard_params

    cfg, ds, props, model, batch = moe_setup()
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    ref = model.forward(params, states, pos)

    qparams = dict(params, backbone=quantize_backbone(params["backbone"], "int8"))
    ex = qparams["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"]
    assert ex["q"].dtype == jnp.int8 and ex["q"].ndim == 3
    out = model.forward(qparams, states, pos)
    scale = float(np.abs(np.asarray(ref)).max())
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.05 * max(scale, 1.0)

    par = ParallelConfig(expert_axis=2)
    specs = param_specs(qparams, par)
    wspec = specs["backbone"]["layers"][0]["mlp"]["experts"]["fc1"]["w"]
    assert wspec["q"][0] == "expert" and wspec["scale"][0] == "expert"
    mesh = make_mesh(par)
    sharded = shard_params(qparams, mesh, par)
    out_s = model.forward(sharded, states, pos)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out), atol=1e-5, rtol=1e-5
    )


def test_quantized_frozen_backbone_train_step(tmp_path):
    """The reference's QLoRA regime (``model.py:51`` + ``training1.yaml:6``):
    packed-nf4 frozen backbone + LoRA adapters through a REAL train step —
    gradients reach only the adapters, loss stays finite, the quantized
    storage is untouched, and the quantized leaves checkpoint-roundtrip
    bit-exactly."""
    from fluid_llm_tpu.train import checkpoint as ckpt
    from fluid_llm_tpu.train.optim import partition
    from fluid_llm_tpu.train.trainer import Trainer, TrainState

    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    trainer = Trainer(model)
    params = model.init(jax.random.PRNGKey(0))
    params["backbone"] = quantize_backbone(params["backbone"], mode="nf4")
    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    opt_state = trainer.opt.init(trainable)

    frozen_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), frozen)
    lora_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), trainable["lora"]
    )
    new_tr, new_opt, metrics = trainer.train_step_autoreg(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(metrics["N_RMSE"])).all()
    # adapters moved...
    lora_after = jax.tree_util.tree_leaves(new_tr["lora"])
    before_leaves = jax.tree_util.tree_leaves(lora_before)
    assert any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(lora_after, before_leaves)
    )
    # ...the quantized frozen storage did not (bit-exact, incl. uint8 packs)
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen),
        jax.tree_util.tree_leaves(frozen_before),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)

    # checkpoint roundtrip of the quantized leaves
    state = TrainState(trainable=new_tr, frozen=frozen, opt_state=new_opt, epoch=1)
    ckpt.save_checkpoint(str(tmp_path), 1, state, cfg)
    p2 = model.init(jax.random.PRNGKey(7))  # different values, same structure
    p2["backbone"] = quantize_backbone(p2["backbone"], mode="nf4")
    t2, f2 = partition(p2, model.trainable_mask(p2))
    like = TrainState(trainable=t2, frozen=f2, opt_state=trainer.opt.init(t2))
    restored = ckpt.restore_checkpoint(str(tmp_path), 1, like)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.frozen),
        jax.tree_util.tree_leaves(frozen),
    ):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
