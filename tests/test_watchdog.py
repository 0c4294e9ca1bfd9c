"""Auto-resume watchdog (``tools/watchdog.py``) supervision logic."""

import jax

from fluid_llm_tpu.tools import watchdog
from fluid_llm_tpu.train import checkpoint as ckpt
from fluid_llm_tpu.train.trainer import Trainer

from test_model import tiny_setup


class FakeRun:
    """Records launched commands; scripted exit codes."""

    def __init__(self, rcs):
        self.rcs = list(rcs)
        self.cmds = []

    def __call__(self, cmd, env=None):
        self.cmds.append(cmd)

        class R:
            returncode = self.rcs.pop(0)

        return R()


def test_fresh_then_resume_after_crash(tmp_path, monkeypatch):
    """Crash after a checkpoint exists -> relaunch via continue_train."""
    # a real checkpoint so _latest_run_state finds something
    cfg, ds, props, model, batch = tiny_setup(seq_len=4, decoder="MLP")
    cfg = cfg.replace(checkpoint_save_path=str(tmp_path))
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    folder = ckpt.make_save_folder(str(tmp_path), None)
    ckpt.save_checkpoint(folder, 0, state, cfg)

    fake = FakeRun([1, 0])  # crash once, then succeed
    monkeypatch.setattr(watchdog.subprocess, "run", fake)
    monkeypatch.setattr(watchdog.time, "sleep", lambda s: None)

    rc = watchdog.supervise("cfg.yaml", str(tmp_path), max_restarts=3, backoff_s=0)
    assert rc == 0
    assert len(fake.cmds) == 2
    # a checkpoint exists, so BOTH attempts go through continue_train
    assert all("fluid_llm_tpu.continue_train" in " ".join(c) for c in fake.cmds)


def test_fresh_start_without_checkpoint(tmp_path, monkeypatch):
    fake = FakeRun([0])
    monkeypatch.setattr(watchdog.subprocess, "run", fake)
    rc = watchdog.supervise("cfg.yaml", str(tmp_path / "none"), max_restarts=1)
    assert rc == 0
    assert "fluid_llm_tpu.main" in " ".join(fake.cmds[0])


def test_restart_budget_exhausted(tmp_path, monkeypatch):
    fake = FakeRun([2, 2, 2])
    monkeypatch.setattr(watchdog.subprocess, "run", fake)
    monkeypatch.setattr(watchdog.time, "sleep", lambda s: None)
    rc = watchdog.supervise("cfg.yaml", str(tmp_path / "none"), max_restarts=2, backoff_s=0)
    assert rc == 2
    assert len(fake.cmds) == 3  # initial + 2 restarts
