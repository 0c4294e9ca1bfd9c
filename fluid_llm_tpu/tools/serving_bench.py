"""8-stream serving bench: serial bs=1 dispatch vs the coalesced bs=N call.

Settles the bs=8 batched-serving question (VERDICT r4 weak #7 / next #6).
BENCHMARKS.md "Batched serving" measured aggregate throughput to be
batch-size-neutral at this model size (2856 aggregate at bs=8 vs 2825 at
bs=1 — cache + decoder HBM traffic per sample dominates; there is no
weight-reuse headroom), while the bs=8 streaming program cold-compiles in
~21 min.  If that neutrality holds through the REAL serving paths, the
batched program is strictly dominated: a burst of N requests served as N
sequential bs=1 device calls finishes its LAST request in the same wall
time as the one bs=N call (whose device time is ~N x the bs=1 call), every
earlier request finishes sooner (better mean latency), and first-token
cost collapses from the bs=8 cold compile to the bs=1 one (~42 s at
compile effort -0.3).

This tool drives ``serve.RolloutEngine`` itself (the coalescing worker,
padding, bucket dispatch — not a hand-rolled loop) with N concurrent
requests carrying N distinct trajectory contexts, in both modes, and
prints one JSON line per mode:

    {"mode": "serial"|"batched", "n_streams": N, "warmup_s": ...,
     "wall_s_per_burst": ..., "aggregate_steps_per_sec": ...,
     "latency_s": {"mean": ..., "max": ...}}

Run on the chip:  python -m fluid_llm_tpu.tools.serving_bench
Env: FLUID_BENCH_STREAMS (default 8), FLUID_BENCH_BUCKET (default 251),
FLUID_BENCH_REPS (default 5 bursts; the first is discarded as warm-in).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_engine_parts():
    """Full serving geometry (the bench_streaming protocol), random params."""
    import jax

    from fluid_llm_tpu.config import Config
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    bucket = int(os.environ.get("FLUID_BENCH_BUCKET", 251))
    cfg = Config(
        llm_backbone="fluid/llama-125m",
        half_precision=True,
        use_lora=False,
        batch_size=1,
        autoreg_seq_len=10,
        seq_len=10,
        resolution=238,
        flash_attention=True,
        pos_embedding_params={"pos_embedding_type": "rope_abs",
                              "input_emb_layer_dropout": 0.0},
        absolute_time_ids=True,
    )
    # model window from the training-shaped dataset; the serving dataset's
    # window covers the bucket (mirrors serve.load_engine's probe/serve split)
    probe = SyntheticCylinderDataset(
        n_trajectories=1, resolution=238, seq_len=10, mode="valid",
        absolute_time=True,
    )
    model = FluidLLM.build(cfg, probe.ds_props())
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
    n_streams = int(os.environ.get("FLUID_BENCH_STREAMS", 8))
    serve_ds = SyntheticCylinderDataset(
        n_trajectories=n_streams, resolution=238, seq_len=bucket + 1,
        mode="test", max_steps=600, absolute_time=True,
    )
    return cfg, model, params, serve_ds, bucket, n_streams


def client_contexts(ds, n_streams):
    """N distinct raw-grid single-frame contexts + the shared mask."""
    from fluid_llm_tpu.core.interp import resample_to_grid

    frames = []
    mask = None
    for i in range(n_streams):
        src = ds.get_trajectory(i)
        grid = np.asarray(resample_to_grid(
            src.node_states[:1], src.vert_idx, src.weights, src.mask))
        frames.append(grid.astype(np.float32))
        mask = np.asarray(src.mask, np.uint8)
    return frames, mask


def run_mode(mode, cfg, model, params, ds, bucket, frames, mask, reps,
             streaming=True):
    from fluid_llm_tpu.tools.serve import RolloutEngine

    n = len(frames)
    t0 = time.monotonic()
    eng = RolloutEngine(
        cfg, model, params, ds, buckets=[bucket], streaming=streaming,
        max_batch=(n if mode == "batched" else 1),
        # a real deployment would use ~10 ms; here every stream fires at
        # once, so a generous window just guarantees full coalescing
        batch_window_ms=1000.0,
    )
    eng.warmup()
    warmup_s = time.monotonic() - t0

    walls, lats = [], []
    for rep in range(reps):
        lat = [None] * n
        t0 = time.monotonic()
        with ThreadPoolExecutor(n) as pool:
            def one(i):
                ts = time.monotonic()
                out = eng.request(frames[i], mask, bucket, 0)
                lat[i] = time.monotonic() - ts
                return out

            outs = list(pool.map(one, range(n)))
        walls.append(time.monotonic() - t0)
        lats.append(lat)
        for o in outs:
            assert o.shape[0] == bucket and np.isfinite(o).all()
    # first burst pays dispatch warm-in (and, in batched mode, possibly a
    # lazily-compiled intermediate size if coalescing raced) — discard it
    walls, lats = walls[1:] or walls, lats[1:] or lats
    wall = float(np.mean(walls))
    flat = [l for burst in lats for l in burst]
    rec = {
        "mode": mode,
        "n_streams": n,
        "bucket": bucket,
        "warmup_s": round(warmup_s, 1),
        "wall_s_per_burst": round(wall, 3),
        "aggregate_steps_per_sec": round(n * bucket / wall, 1),
        "latency_s": {"mean": round(float(np.mean(flat)), 3),
                      "max": round(float(np.max(flat)), 3)},
        "coalesced_groups": eng.stats().get("coalesced_groups", 0),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.cache/fluid_llm_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # serving compile-effort default (BENCHMARKS.md "Cold compile")
    effort = os.environ.get("FLUID_COMPILE_EFFORT", "-0.3")
    if effort not in ("", "default"):
        jax.config.update("jax_exec_time_optimization_effort", float(effort))

    cfg, model, params, ds, bucket, n_streams = build_engine_parts()
    frames, mask = client_contexts(ds, n_streams)
    reps = int(os.environ.get("FLUID_BENCH_REPS", 5))
    modes = os.environ.get("FLUID_BENCH_MODES", "serial,batched").split(",")
    for mode in modes:
        run_mode(mode, cfg, model, params, ds, bucket, frames, mask, reps)


if __name__ == "__main__":
    main()
