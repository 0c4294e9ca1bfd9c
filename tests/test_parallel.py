"""Sharded training on the virtual 8-device CPU mesh (dp x fsdp x tp)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fluid_llm_tpu.config import ParallelConfig
from fluid_llm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)
from fluid_llm_tpu.train.optim import partition
from fluid_llm_tpu.train.trainer import Trainer

from test_model import tiny_setup


@pytest.fixture(scope="module")
def setup():
    return tiny_setup(seq_len=4, decoder="MLP")


def test_mesh_axes():
    par = ParallelConfig(model_axis=2, fsdp_axis=2)
    mesh = make_mesh(par)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}
    par_dp = ParallelConfig()
    mesh_dp = make_mesh(par_dp)
    assert dict(mesh_dp.shape) == {"data": 8, "fsdp": 1, "model": 1}


def test_param_specs_cover_tree(setup):
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    specs = param_specs(params, ParallelConfig(model_axis=2, fsdp_axis=2))
    # structures must match exactly
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda *_: 0, params, specs,
                               is_leaf=lambda x: isinstance(x, P))
    )
    assert t1 == t2
    # tensor-parallel: attention q sharded on output dim
    assert specs["backbone"]["layers"][0]["attn"]["q"]["w"] == P("fsdp", "model")
    assert specs["backbone"]["layers"][0]["attn"]["o"]["w"] == P("model", "fsdp")


@pytest.mark.parametrize("model_ax,fsdp_ax", [(1, 1), (2, 2), (2, 1)])
def test_sharded_train_step(setup, model_ax, fsdp_ax):
    cfg, ds, props, model, _ = setup
    from fluid_llm_tpu.data.pipeline import make_batches

    batch = next(make_batches(ds, 2, shuffle=False))
    # pad batch to 8 samples so it divides data*fsdp
    batch = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)

    par = ParallelConfig(model_axis=model_ax, fsdp_axis=fsdp_ax)
    mesh = make_mesh(par)
    trainer = Trainer(model)
    params = model.init(jax.random.PRNGKey(0))
    params = shard_params(params, mesh, par)
    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    opt_state = trainer.opt.init(trainable)
    sharded = shard_batch(batch, mesh)

    new_trainable, new_opt, metrics = trainer.train_step_autoreg(
        trainable, frozen, opt_state, sharded, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(metrics["N_RMSE"])).all()


def test_sharded_matches_single_device(setup):
    """DP-sharded step must equal the unsharded step bit-for-bit-ish."""
    cfg, ds, props, model, _ = setup
    from fluid_llm_tpu.data.pipeline import make_batches

    batch = next(make_batches(ds, 2, shuffle=False))
    batch8 = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)

    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0, o0, m0 = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch8, jax.random.PRNGKey(1)
    )

    par = ParallelConfig()
    mesh = make_mesh(par)
    state2 = trainer.init_state(jax.random.PRNGKey(0))
    sharded = shard_batch(batch8, mesh)
    t1, o1, m1 = trainer.train_step_autoreg(
        state2.trainable, state2.frozen, state2.opt_state, sharded, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    l0 = jax.tree_util.tree_leaves(t0)[0]
    l1 = jax.tree_util.tree_leaves(t1)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)


def test_train_run_with_mesh(tmp_path):
    """Full epoch loop with mesh-sharded batches on the 8-device CPU mesh."""
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.train.loop import train_run

    cfg, _, props, model, _ = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=1, batch_size=8, save_on=False)
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    ds = SyntheticCylinderDataset(n_trajectories=8, resolution=64, seq_len=4, mode="valid")

    par = ParallelConfig()
    mesh = make_mesh(par)
    trainer = Trainer(model)
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh, par)
    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    from fluid_llm_tpu.train.trainer import TrainState

    state = TrainState(trainable=trainable, frozen=frozen,
                       opt_state=trainer.opt.init(trainable))
    logs = []
    state = train_run(cfg, trainer, state, ds, ds, rng=jax.random.PRNGKey(1),
                      log_fn=lambda m, e: logs.append(m), mesh=mesh)
    assert state.epoch == 1
    assert any("train/Autoreg/loss" in m for m in logs)


def test_llama_family_tp_train_step():
    """Stretch-config path: rope + RMSNorm + GQA backbone, tensor-parallel
    sharding, LoRA adapters — one sharded train step end-to-end."""
    from fluid_llm_tpu.config import Config
    from fluid_llm_tpu.data.pipeline import make_batches
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    cfg = Config(
        llm_backbone="huggyllama/llama-7b", llm_layers=2, half_precision=False,
        use_lora=True, batch_size=2, autoreg_seq_len=4, seq_len=4,
        resolution=64, flash_attention=False,
        decoder_params={"type": "MLP", "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu", "zero_last_layer": False},
        encoder_params={"type": "MLP", "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu"},
    )
    ds = SyntheticCylinderDataset(n_trajectories=8, resolution=64, seq_len=4, mode="valid")
    model = FluidLLM.build(
        cfg, ds.ds_props(),
        n_layers=2, d_model=64, n_heads=8, n_kv_heads=4, d_ff=128,
        max_pos=128, dropout=0.0,
    )
    assert model.backbone_cfg.family == "llama"
    batch = next(make_batches(ds, 8, shuffle=False))

    par = ParallelConfig(model_axis=2, fsdp_axis=2)
    mesh = make_mesh(par)
    trainer = Trainer(model)
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh, par)
    mask = model.trainable_mask(params)
    trainable, frozen = partition(params, mask)
    opt_state = trainer.opt.init(trainable)
    tr, opt, metrics = trainer.train_step_autoreg(
        trainable, frozen, opt_state, shard_batch(batch, mesh), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_checkpoint_resume(tmp_path):
    """Train sharded -> save -> restore through the mesh-aware template ->
    one more sharded step (VERDICT r1 #7: resume must rebuild the mesh)."""
    import numpy as np
    from jax.sharding import NamedSharding

    from fluid_llm_tpu.main import finish_state
    from fluid_llm_tpu.train import checkpoint as ckpt
    from fluid_llm_tpu.train.trainer import Trainer, TrainState
    from test_model import tiny_setup

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP", use_lora=True)
    cfg = cfg.replace(parallel=ParallelConfig(model_axis=2, fsdp_axis=2))
    # pad batch to 8 samples so it divides data*fsdp
    batch = tuple(np.concatenate([np.asarray(x)] * 4, axis=0) for x in batch)
    trainer = Trainer(model)

    params = model.init(jax.random.PRNGKey(0))
    state, mesh = finish_state(params, model, trainer, cfg)
    assert mesh is not None and dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}

    sharded_batch = shard_batch(batch, mesh)
    state.trainable, state.opt_state, m = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, sharded_batch,
        jax.random.PRNGKey(1),
    )
    state.epoch = 1
    save_path = str(tmp_path)
    ckpt.save_checkpoint(save_path, 1, state, cfg)

    # restore into a sharded template (the continue_train path)
    params2 = model.init(jax.random.PRNGKey(9))
    like, mesh2 = finish_state(params2, model, trainer, cfg)
    restored = ckpt.restore_checkpoint(save_path, 1, like)
    # restored leaves carry the mesh sharding
    leaf = restored.frozen["backbone"]["layers"][0]["attn"]["q"]["w"]
    assert isinstance(leaf.sharding, NamedSharding)
    assert leaf.sharding.mesh.shape == mesh2.shape

    # restored values equal an unsharded restore
    like_plain = trainer.init_state(jax.random.PRNGKey(9))
    restored_plain = ckpt.restore_checkpoint(save_path, 1, like_plain)
    a = jax.tree_util.tree_leaves(restored.trainable)[0]
    b = jax.tree_util.tree_leaves(restored_plain.trainable)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # one more sharded step runs and is finite
    tr, opt, m2 = trainer.train_step_autoreg(
        restored.trainable, restored.frozen, restored.opt_state,
        shard_batch(batch, mesh2), jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m2["loss"]))


class _FakeDev:
    """Minimal device stand-in for the multi-host ordering math."""

    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"p{self.process_index}d{self.id}"


def test_multihost_device_order_keeps_model_fsdp_on_host():
    from fluid_llm_tpu.parallel.mesh import mesh_shape, multihost_device_order

    # 4 processes x 8 local devices = 32; fsdp=2, model=4 must stay on-host
    devs = [_FakeDev(p, p * 8 + i) for p in range(4) for i in range(8)]
    data, fsdp, model = mesh_shape(32, ParallelConfig(model_axis=4, fsdp_axis=2))
    assert (data, fsdp, model) == (4, 2, 4)
    arr = multihost_device_order(devs, data, fsdp, model)
    assert arr.shape == (4, 2, 4)
    # every (fsdp, model) slice at a fixed data coordinate is single-process
    for di in range(4):
        procs = {d.process_index for d in arr[di].ravel()}
        assert len(procs) == 1, f"data row {di} spans processes {procs}"
    # data rows cover all processes in order, devices sorted by id
    assert [arr[di, 0, 0].process_index for di in range(4)] == [0, 1, 2, 3]
    assert [d.id for d in arr[0].ravel()] == list(range(8))


def test_multihost_device_order_rejects_cross_host_model_axis():
    from fluid_llm_tpu.parallel.mesh import multihost_device_order

    devs = [_FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    with pytest.raises(ValueError, match="must divide"):
        # model=8 > 4 local devices would force TP over DCN
        multihost_device_order(devs, 1, 1, 8)
    with pytest.raises(ValueError, match="uneven"):
        multihost_device_order(devs + [_FakeDev(2, 100)], 3, 1, 3)


def test_multihost_local_data_rows_contiguous():
    from fluid_llm_tpu.parallel.mesh import multihost_device_order

    # 2 procs x 4 devices, pure data parallel: rows 0-3 proc0, 4-7 proc1 —
    # the contiguity contract shard_batch's local-slice logic relies on
    devs = [_FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    arr = multihost_device_order(devs, 8, 1, 1)
    assert [arr[i, 0, 0].process_index for i in range(8)] == [0] * 4 + [1] * 4
