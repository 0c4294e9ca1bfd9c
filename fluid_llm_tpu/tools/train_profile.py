"""Profile the anchor-config training step and print a per-op time table.

Captures a ``jax.profiler`` trace of a few compiled steps (the same program
``bench.py train`` times) and aggregates device-side event durations by op
category, so MFU work targets measured sinks instead of guesses.

Usage:  python -m fluid_llm_tpu.tools.train_profile [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def run_trace(trace_dir: str) -> None:
    import jax

    from fluid_llm_tpu.config import Config
    from fluid_llm_tpu.data.pipeline import make_batches
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.models.fluid_llm import FluidLLM
    from fluid_llm_tpu.train.trainer import Trainer

    cfg = Config(
        llm_backbone="facebook/opt-125m", half_precision=True, use_lora=True,
        batch_size=8, autoreg_seq_len=10, seq_len=10, resolution=238,
        flash_attention=True,
    )
    ds = SyntheticCylinderDataset(n_trajectories=8, resolution=238, seq_len=10, mode="valid")
    model = FluidLLM.build(cfg, ds.ds_props())
    batch = next(make_batches(ds, cfg.batch_size, shuffle=False))
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    step = trainer.train_step_autoreg

    tr, opt, m = step(state.trainable, state.frozen, state.opt_state, batch, rng)
    float(m["loss"].mean())  # warm (axon: value fetch, not block_until_ready)

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            tr, opt, m = step(tr, state.frozen, opt, batch, rng)
        float(m["loss"].mean())


def summarize(trace_dir: str, top: int = 40) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace.json.gz under {trace_dir}; files: "
              f"{glob.glob(os.path.join(trace_dir, '**', '*'), recursive=True)[:20]}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f).get("traceEvents", [])

    # keep complete events from device lanes (TensorFlow Op / XLA Ops tracks)
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name" and "args" in e}
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        proc = pid_names.get(e.get("pid"), "")
        if "TPU" not in proc and "/device" not in proc.lower():
            continue
        if "XLA Ops" not in lane and "XLA TraceMe" not in lane and "Steps" not in lane:
            if "XLA Modules" in lane:
                continue
        name = e.get("name", "?")
        if "XLA Ops" in lane:
            by_op[name] += e["dur"]
            total += e["dur"]
    print(f"trace: {path}")
    print(f"total XLA-op device time: {total / 1e3:.2f} ms (3 steps)")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:9.3f} ms  {100 * dur / max(total, 1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fluid_train_trace"
    run_trace(trace_dir)
    summarize(trace_dir)
