"""End-to-end: train -> checkpoint -> resume/restore -> inference rollout."""

import jax
import numpy as np

from fluid_llm_tpu.inference import test_generate as run_test_generate
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.loop import train_run
from fluid_llm_tpu.train.trainer import Trainer

from test_model import tiny_setup


def test_train_loop_checkpoint_restore_inference(tmp_path):
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=2, save_model_each=1, batch_size=2,
                      checkpoint_save_path=str(tmp_path))
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))

    save_path = ckpt.make_save_folder(str(tmp_path), None)
    logs = []
    state = train_run(
        cfg, trainer, state, ds, ds, save_path=save_path,
        rng=jax.random.PRNGKey(1), log_fn=lambda m, e: logs.append((e, m)),
    )
    assert state.epoch == 2
    assert any("val/Gen/N_RMSE" in m for _, m in logs)

    # restore into a fresh state and verify leaves match
    like = trainer.init_state(jax.random.PRNGKey(2))
    restored = ckpt.restore_checkpoint(save_path, 1, like)
    # restored epoch recorded
    assert restored.epoch == 1
    # saved config round-trips
    cfg2 = ckpt.load_config(save_path)
    assert cfg2.autoreg_seq_len == cfg.autoreg_seq_len

    # inference protocol on the restored params (short rollout)
    per_step, mean = run_test_generate(
        model, restored.params, ds, batch_size=2, pred_steps=3, ctx_states=1
    )
    assert per_step.shape == (3,)
    assert np.isfinite(mean)


def test_final_epoch_checkpoint_saved(tmp_path):
    """A run whose length is not a multiple of ``save_model_each`` still
    persists its FINAL state (the in-loop cadence alone would silently lose
    the tail epochs — e.g. 400 epochs at each=50 last saved at 350)."""
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=4, save_model_each=2, batch_size=2,
                      checkpoint_save_path=str(tmp_path))
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    save_path = ckpt.make_save_folder(str(tmp_path), None)
    train_run(cfg, trainer, state, ds, ds, save_path=save_path,
              rng=jax.random.PRNGKey(1))
    # cadence saves at epochs 0 and 2; the final state (epoch 3) must exist
    assert ckpt.latest_step(save_path) == 3
    like = trainer.init_state(jax.random.PRNGKey(2))
    assert ckpt.restore_checkpoint(save_path, 3, like).epoch == 3


def test_training_reduces_loss():
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    losses = []
    rng = jax.random.PRNGKey(3)
    for i in range(12):
        rng, sk = jax.random.split(rng)
        state.trainable, state.opt_state, metrics = trainer.train_step_autoreg(
            state.trainable, state.frozen, state.opt_state, batch, sk
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_profiler_trace_capture(tmp_path):
    """cfg.profile_dir captures a jax.profiler trace of epoch 0 (the
    observability addition over the reference, SURVEY.md §5)."""
    import os

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=1, save_on=False, profile_dir=str(tmp_path / "trace"))
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    train_run(cfg, trainer, state, ds, ds, rng=jax.random.PRNGKey(1))
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no trace files written"


def test_adafactor_train_epoch_runs():
    """The epoch loop trains with optimizer='adafactor' (lr injection,
    metrics, val step) — the full-FT 7B memory recipe's optimizer."""
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=1, save_on=False, optimizer="adafactor")
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    logs = []
    train_run(cfg, trainer, state, ds, ds, rng=jax.random.PRNGKey(1),
              log_fn=lambda m, e: logs.append(m))
    assert logs
    loss_keys = [k for k in logs[0] if k.endswith("/loss")]
    assert loss_keys and all(np.isfinite(logs[0][k]) for k in loss_keys), logs[0]


def test_val_plot_dir_writes_comparison_figures(tmp_path):
    """cfg.val_plot_dir writes target-vs-prediction frames on validation
    epochs (beyond the reference, which only plots at inference)."""
    import os

    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(num_epochs=1, save_on=False,
                      val_plot_dir=str(tmp_path / "valplots"))
    model = model.__class__(cfg=cfg, ds_props=model.ds_props, backbone_cfg=model.backbone_cfg)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    train_run(cfg, trainer, state, ds, ds, rng=jax.random.PRNGKey(1))
    epoch_dir = tmp_path / "valplots" / "epoch_0000"
    pngs = sorted(os.listdir(epoch_dir))
    assert pngs and all(f.endswith(".png") for f in pngs), pngs
