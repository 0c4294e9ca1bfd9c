"""Optimizer construction: StepLR injection, torch-style L2, MultiSteps."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.train.optim import (
    build_optimizer,
    combine,
    partition,
    set_learning_rate,
    steplr,
)


def test_steplr_matches_torch():
    sched = steplr(1e-3, 50, 0.75)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=50, gamma=0.75)
    for epoch in range(130):
        np.testing.assert_allclose(sched(epoch), tsched.get_last_lr()[0], rtol=1e-9)
        opt.step()
        tsched.step()


def test_injected_lr_changes_updates():
    cfg = Config(optimizer="adamw", learning_rate=1e-3, weight_decay=0.0)
    opt = build_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((3,))}
    up1, state1 = opt.update(grads, state, params)
    state1 = set_learning_rate(state1, 1e-4)
    up2, _ = opt.update(grads, state1, params)
    ratio = float(up2["w"][0] / up1["w"][0])
    np.testing.assert_allclose(ratio, 0.1, rtol=0.2)


def test_adam_weight_decay_matches_torch_l2():
    """optimizer='adam' applies torch-style L2 (decay added to grads)."""
    cfg = Config(optimizer="adam", learning_rate=1e-2, weight_decay=0.1)
    opt = build_optimizer(cfg)
    w0 = np.array([1.0, -2.0, 0.5], np.float32)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    grads = {"w": jnp.asarray([0.3, 0.1, -0.2], np.float32)}
    import optax

    up, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, up)

    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tp], lr=1e-2, weight_decay=0.1)
    tp.grad = torch.tensor([0.3, 0.1, -0.2])
    topt.step()
    np.testing.assert_allclose(np.asarray(new["w"]), tp.detach().numpy(), atol=1e-6)


def test_multisteps_accumulation():
    cfg = Config(optimizer="adamw", learning_rate=1e-3, grad_accum_steps=3)
    opt = build_optimizer(cfg)
    params = {"w": jnp.zeros((2,))}
    state = opt.init(params)
    import optax

    for i in range(2):  # first 2 micro-steps: no update applied
        up, state = opt.update({"w": jnp.ones((2,))}, state, params)
        assert float(jnp.abs(up["w"]).sum()) == 0.0
    up, state = opt.update({"w": jnp.ones((2,))}, state, params)
    assert float(jnp.abs(up["w"]).sum()) > 0.0
    # lr injection reaches through the MultiSteps wrapper
    state = set_learning_rate(state, 5e-4)


def test_adafactor_state_is_factored_and_lr_injectable():
    """optimizer='adafactor' (TPU-native addition): second moment factored
    into row/col vectors for matrices — the full-FT 7B memory enabler — and
    the epoch loop's lr injection reaches it like the other optimizers."""
    cfg = Config(optimizer="adafactor", learning_rate=1e-3, weight_decay=0.0)
    opt = build_optimizer(cfg)
    params = {"w": jnp.ones((256, 512)), "b": jnp.ones((8,))}
    state = opt.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    sizes = [l.size for l in leaves if hasattr(l, "size")]
    # no leaf is O(rows*cols): the largest state leaf is a row/col vector
    assert max(sizes) <= 512, sizes
    grads = {"w": jnp.full((256, 512), 0.1), "b": jnp.full((8,), 0.1)}
    up1, state1 = opt.update(grads, state, params)
    assert float(jnp.abs(up1["w"]).sum()) > 0.0
    state1 = set_learning_rate(state1, 1e-4)
    up2, _ = opt.update(grads, state1, params)
    ratio = float(jnp.abs(up2["w"]).mean() / jnp.abs(up1["w"]).mean())
    np.testing.assert_allclose(ratio, 0.1, rtol=0.25)


def test_partition_combine_roundtrip():
    params = {"a": jnp.ones(2), "b": {"c": jnp.zeros(3), "d": jnp.ones(1)}}
    mask = {"a": True, "b": {"c": False, "d": True}}
    tr, fr = partition(params, mask)
    assert tr["b"]["c"] is None and fr["a"] is None
    back = combine(tr, fr)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(params)
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.zeros(3))


def test_lr_schedule_continues_on_resume():
    """Resumed training must continue the StepLR decay at the global epoch
    (the reference restores scheduler state, continue_train.py:35-36)."""
    from test_model import tiny_setup

    from fluid_llm_tpu.train.loop import train_run
    from fluid_llm_tpu.train.trainer import Trainer

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=1, save_on=False, schedule_epoch=50,
                      schedule_gamma=0.5, learning_rate=1e-3)
    model = model.__class__(cfg=cfg, ds_props=model.ds_props,
                            backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    logs = []
    train_run(cfg, trainer, state, ds, ds, start_ep=120,
              rng=jax.random.PRNGKey(1), log_fn=lambda m, e: logs.append((e, m)))
    epoch, metrics = logs[0]
    assert epoch == 120
    # epoch 120 with step 50 / gamma 0.5 -> lr * 0.5**2
    np.testing.assert_allclose(metrics["lr"], 1e-3 * 0.25, rtol=1e-9)


def test_frozen_bf16_storage():
    """``cfg.frozen_bf16`` stores the frozen backbone in bf16 (the
    reference loads its backbone in torch bf16, ``model.py:46-55``) while
    trainable params and optimizer state stay f32; the train step runs and
    matches the f32-frozen step within bf16 rounding."""
    from fluid_llm_tpu.train.trainer import Trainer
    from test_model import tiny_setup

    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_lora=True
    )
    trainer32 = Trainer(model)
    s32 = trainer32.init_state(jax.random.PRNGKey(0))

    model16 = model.__class__(
        cfg=cfg.replace(frozen_bf16=True),
        ds_props=model.ds_props,
        backbone_cfg=model.backbone_cfg,
    )
    trainer16 = Trainer(model16)
    s16 = trainer16.init_state(jax.random.PRNGKey(0))

    fr_leaf = s16.frozen["backbone"]["layers"][0]["attn"]["q"]["w"]
    assert fr_leaf.dtype == jnp.bfloat16
    tr_leaves = [x for x in jax.tree_util.tree_leaves(s16.trainable)
                 if hasattr(x, "dtype")]
    assert all(x.dtype == jnp.float32 for x in tr_leaves)

    _, _, m32 = trainer32.train_step_autoreg(
        s32.trainable, s32.frozen, s32.opt_state, batch, jax.random.PRNGKey(1)
    )
    _, _, m16 = trainer16.train_step_autoreg(
        s16.trainable, s16.frozen, s16.opt_state, batch, jax.random.PRNGKey(1)
    )
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    np.testing.assert_allclose(l16, l32, rtol=2e-2)


def test_frozen_bf16_checkpoint_roundtrip(tmp_path):
    """A frozen_bf16 run checkpoints bf16 frozen leaves and restores into a
    frozen_bf16 template exactly (self-consistent resume)."""
    from fluid_llm_tpu.train import checkpoint as ckpt
    from fluid_llm_tpu.train.trainer import Trainer
    from test_model import tiny_setup

    cfg, ds, props, model, batch = tiny_setup(
        seq_len=4, decoder="MLP", use_lora=True
    )
    cfg16 = cfg.replace(frozen_bf16=True)
    model16 = model.__class__(
        cfg=cfg16, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg
    )
    trainer = Trainer(model16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state.epoch = 1
    ckpt.save_checkpoint(str(tmp_path), 1, state, cfg16)

    like = trainer.init_state(jax.random.PRNGKey(7))
    restored = ckpt.restore_checkpoint(str(tmp_path), 1, like)
    leaf = restored.frozen["backbone"]["layers"][0]["attn"]["q"]["w"]
    assert leaf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(leaf, np.float32),
        np.asarray(state.frozen["backbone"]["layers"][0]["attn"]["q"]["w"],
                   np.float32),
    )
    _, _, m = trainer.train_step_autoreg(
        restored.trainable, restored.frozen, restored.opt_state, batch,
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m["loss"]))
