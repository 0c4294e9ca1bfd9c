"""Pipeline parallelism (GPipe schedule over the ``pipe`` mesh axis).

The reference has no pipeline parallelism (SURVEY.md §2.4); this subsystem
goes beyond parity.  Tests run on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fluid_llm_tpu.config import Config, ParallelConfig
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.parallel import pipeline as pp
from fluid_llm_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

from test_model import TINY, tiny_setup


@pytest.fixture(scope="module")
def bb_setup():
    cfg = bb.BackboneConfig(family="gpt2", n_layers=4, d_model=32, n_heads=4,
                            d_ff=64, dtype=jnp.float32)
    params = bb.stack_layers(bb.init_params(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 12, 32), jnp.float32)
    valid = jnp.ones((8, 12), bool).at[0, :3].set(False)
    return cfg, params, x, valid


def test_pipe_mesh_axes():
    mesh = make_mesh(ParallelConfig(pipe_axis=4))
    assert dict(mesh.shape) == {"data": 2, "fsdp": 1, "model": 1, "pipe": 4}
    # pipe stays LAST so stage hops are neighbouring device ids
    assert mesh.axis_names[-1] == "pipe"


@pytest.mark.parametrize("n_pipe,n_mb", [(2, 4), (4, 4), (4, 8)])
def test_pipelined_forward_matches_dense(bb_setup, n_pipe, n_mb):
    cfg, params, x, valid = bb_setup
    ref = bb.apply(params, cfg, x, valid)

    mesh = make_mesh(ParallelConfig(pipe_axis=n_pipe))
    sharded = pp.shard_pipeline_params(params, mesh)
    out = jax.jit(
        lambda p, xx, v: pp.apply_pipelined(
            p, cfg, xx, v, mesh=mesh, n_microbatches=n_mb)
    )(sharded, x, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipelined_grads_match_dense(bb_setup):
    cfg, params, x, valid = bb_setup
    mesh = make_mesh(ParallelConfig(pipe_axis=4))
    sharded = pp.shard_pipeline_params(params, mesh)

    # a fixed random cotangent keeps leaf grads away from the
    # catastrophic-cancellation regime of sum-of-squares at init
    cot = jax.random.normal(jax.random.PRNGKey(7), (8, 12, 32), jnp.float32)

    def loss_pp(lp):
        p = dict(sharded, layers=lp)
        return jnp.sum(
            pp.apply_pipelined(p, cfg, x, valid, mesh=mesh,
                               n_microbatches=4) * cot)

    def loss_ref(lp):
        return jnp.sum(bb.apply(dict(params, layers=lp), cfg, x, valid) * cot)

    g_pp = jax.jit(jax.grad(loss_pp))(sharded["layers"])
    g_ref = jax.jit(jax.grad(loss_ref))(params["layers"])
    # stage grads live on their stage (no cross-pipe reduction of layers)
    leaf = g_pp["attn"]["q"]["w"]
    assert leaf.sharding.spec[0] == "pipe"
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_pp, g_ref)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4 * scale


def test_pipe_param_specs_lead_with_pipe(bb_setup):
    cfg, params, _, _ = bb_setup
    from fluid_llm_tpu.parallel.mesh import backbone_param_specs

    specs = backbone_param_specs(params, fsdp=False, tp=True, pp=True)
    assert specs["layers"]["attn"]["q"]["w"] == P("pipe", None, "model")
    assert specs["layers"]["ln1"]["scale"] == P("pipe")
    assert specs["final_norm"]["scale"] == P()


def test_pipelined_train_step():
    """Full-FT FluidLLM train step with a pipelined backbone (pipe=2 x
    data=4): runs, loss finite + equals the dense-backbone loss."""
    from fluid_llm_tpu.data.pipeline import make_batches
    from fluid_llm_tpu.train.optim import partition
    from fluid_llm_tpu.train.trainer import Trainer

    par = ParallelConfig(pipe_axis=2, pipe_microbatches=4)
    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_lora=False, parallel=par)
    batch = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)

    mesh = make_mesh(par)
    trainer = Trainer(model)
    params = model.init(jax.random.PRNGKey(0))
    assert not isinstance(params["backbone"]["layers"], list)  # stacked
    params = shard_params(params, mesh, par)
    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    opt_state = trainer.opt.init(trainable)
    sharded = shard_batch(batch, mesh)

    new_tr, new_opt, metrics = trainer.train_step_autoreg(
        trainable, frozen, opt_state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # dense reference: same stacked params, pipe disabled
    cfg_dense = cfg.replace(parallel=ParallelConfig())
    model_dense = model.__class__(cfg=cfg_dense, ds_props=model.ds_props,
                                  backbone_cfg=model.backbone_cfg)
    trainer_dense = Trainer(model_dense)
    params_dense = model.init(jax.random.PRNGKey(0))
    tr_d, fr_d = partition(params_dense, model_dense.trainable_mask(params_dense))
    _, _, metrics_dense = trainer_dense.train_step_autoreg(
        tr_d, fr_d, trainer_dense.opt.init(tr_d), batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_dense["loss"]), rtol=1e-4)


def test_pipelined_bf16_grads_compile():
    """bf16 models must compile fwd+bwd through the pipeline: the manual
    psum lowering on the CPU backend crashes on 16-bit all-reduces
    (AllReducePromotion "Invalid binary instruction opcode copy"), so the
    pipeline keeps its cross-stage reductions in f32."""
    cfg = bb.BackboneConfig(family="llama", n_layers=2, d_model=32, n_heads=4,
                            n_kv_heads=4, d_ff=64, dtype=jnp.bfloat16,
                            norm="rmsnorm", pos="rope")
    params = bb.stack_layers(bb.init_params(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32), jnp.bfloat16)
    mesh = make_mesh(ParallelConfig(pipe_axis=2))
    sharded = pp.shard_pipeline_params(params, mesh)

    def loss(lp):
        p = dict(sharded, layers=lp)
        out = pp.apply_pipelined(p, cfg, x, None, mesh=mesh, n_microbatches=2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    val, g = jax.jit(jax.value_and_grad(loss))(sharded["layers"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(l, dtype=np.float32)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_seq_sharded_acts_matches_dense():
    """Megatron-SP activation sharding (tokens over the model axis between
    blocks) is a pure layout annotation — the TP train step loss must be
    unchanged."""
    from fluid_llm_tpu.train.optim import partition
    from fluid_llm_tpu.train.trainer import Trainer

    losses = {}
    for sp in (False, True):
        par = ParallelConfig(model_axis=2, fsdp_axis=2, seq_sharded_acts=sp)
        cfg, ds, props, model, batch = tiny_setup(
            seq_len=4, decoder="MLP", use_lora=True, parallel=par)
        batch = tuple(np.concatenate([np.asarray(x)] * 4, axis=0)
                      for x in batch)
        mesh = make_mesh(par)
        trainer = Trainer(model)
        params = shard_params(model.init(jax.random.PRNGKey(0)), mesh, par)
        tr, fr = partition(params, model.trainable_mask(params))
        _, _, metrics = trainer.train_step_autoreg(
            tr, fr, trainer.opt.init(tr), shard_batch(batch, mesh),
            jax.random.PRNGKey(1))
        losses[sp] = float(metrics["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_pipe_rejects_lora():
    par = ParallelConfig(pipe_axis=2)
    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_lora=True, parallel=par)
    with pytest.raises(ValueError, match="full-FT"):
        model.init(jax.random.PRNGKey(0))


def test_unstack_roundtrip_and_pipeline_checkpoint_serves():
    """unstack_layers inverts stack_layers, and prepare_inference_params
    works on a pipeline-trained (stacked-layout) param tree — its prepared
    forward equals preparing the list-layout params (review fix: the
    per-layer weight transforms used to TypeError on stacked trees)."""
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    params = model.init(jax.random.PRNGKey(0))

    stacked = bb.stack_layers(params["backbone"])
    assert not isinstance(stacked["layers"], list)
    unstacked = bb.unstack_layers(stacked)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(params["backbone"]),
        jax.tree_util.tree_leaves(unstacked),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    cfg_pp = cfg.replace(use_lora=False, parallel={"pipe_axis": 2})
    model_pp = FluidLLM.build(cfg_pp, props, **TINY)
    params_pp = model_pp.init(jax.random.PRNGKey(0))  # stacked by init
    assert not isinstance(params_pp["backbone"]["layers"], list)
    prep = model_pp.prepare_inference_params(params_pp)

    # reference: prepare the same weights in the list layout via the
    # non-pipeline twin
    model_sd = FluidLLM.build(cfg.replace(use_lora=False), props, **TINY)
    params_sd = dict(params_pp, backbone=bb.unstack_layers(params_pp["backbone"]))
    prep_sd = model_sd.prepare_inference_params(params_sd)

    states, _, _, _, pos = batch
    out_pp = model_sd.forward(prep, states, pos)  # serve pipe ckpt single-dev
    out_sd = model_sd.forward(prep_sd, states, pos)
    np.testing.assert_allclose(
        np.asarray(out_pp), np.asarray(out_sd), atol=1e-6
    )
