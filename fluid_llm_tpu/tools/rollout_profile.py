"""Exact-rollout performance attribution on the real TPU.

Two modes (both run the 251-step serving protocol, ``src/inference.py:85-87``
geometry):

    python -m fluid_llm_tpu.tools.rollout_profile attr
        Times stubbed variants (no attention / 6 layers / MLP decoder) and
        prints a ms/step attribution table.

    python -m fluid_llm_tpu.tools.rollout_profile trace
        Traces one rollout with ``jax.profiler`` and aggregates per-op
        device time from the xplane (top fusions + category rollup).

The r3 findings produced by this tool are recorded in BENCHMARKS.md
("r3 per-op profile"): the exact step is at its op-level floor, the only
structural headroom being the half-MXU QK^T at head_dim 64.
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

SEQ_LEN = 10
PRED_STEPS = int(os.environ.get("BENCH_ROLLOUT_STEPS", 251))


def _build(decoder: str | None = None, **overrides):
    from fluid_llm_tpu.config import Config
    from fluid_llm_tpu.data.pipeline import make_batches
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    cfg = Config(
        llm_backbone="facebook/opt-125m",
        half_precision=True,
        use_lora=False,
        freeze_llm=False,
        batch_size=1,
        autoreg_seq_len=SEQ_LEN,
        seq_len=SEQ_LEN,
        resolution=238,
        flash_attention=True,
    )
    if decoder:
        cfg.decoder_params.type = decoder
    ds = SyntheticCylinderDataset(
        n_trajectories=1, resolution=238, seq_len=SEQ_LEN, mode="test", max_steps=600
    )
    model = FluidLLM.build(cfg, ds.ds_props(), **overrides)
    batch = next(make_batches(ds, 1, shuffle=False))
    return model, batch


def _timed_roll(model, batch, tag, n_rep=6):
    import jax

    from fluid_llm_tpu.rollout.generate import generate

    states, _, _, bc_mask, pos = batch
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
    roll = jax.jit(lambda p, s, m, pid: generate(model, p, s, m, pid, PRED_STEPS))
    init, bc_mask, pos = (
        jax.device_put(states[:, :1]), jax.device_put(bc_mask), jax.device_put(pos)
    )
    t0 = time.time()
    st, _ = roll(params, init, bc_mask, pos)
    float(st.mean())
    print(f"{tag}: compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(n_rep):
        st, _ = roll(params, init, bc_mask, pos)
    float(st.mean())
    dt = (time.time() - t0) / n_rep
    print(f"{tag}: {PRED_STEPS/dt:.1f} steps/s  ({dt/PRED_STEPS*1e3:.3f} ms/step)",
          flush=True)
    return dt / PRED_STEPS, (roll, params, init, bc_mask, pos)


def attr():
    import fluid_llm_tpu.models.backbone as backbone

    results = {}
    model, batch = _build()
    results["base"], _ = _timed_roll(model, batch, "base (12 layers, MLPGNN dec)")

    real = backbone._sdpa
    backbone._sdpa = lambda q, k, v, allowed, valid, cfg, **kw: v
    try:
        model, batch = _build()
        results["noattn"], _ = _timed_roll(model, batch, "no-attention (sdpa->v)")
    finally:
        backbone._sdpa = real

    model, batch = _build(n_layers=6)
    results["l6"], _ = _timed_roll(model, batch, "6 layers")

    model, batch = _build(decoder="MLP")
    results["mlpdec"], _ = _timed_roll(model, batch, "MLP decoder")

    print(f"attention total:   {(results['base']-results['noattn'])*1e3:.3f} ms/step")
    print(f"6 backbone layers: {(results['base']-results['l6'])*1e3:.3f} ms/step")
    print(f"MLPGNN-vs-MLP dec: {(results['base']-results['mlpdec'])*1e3:.3f} ms/step")


def _build_streaming():
    """The streaming-serving stack (mirrors ``bench.py::bench_streaming``)."""
    from fluid_llm_tpu.config import Config
    from fluid_llm_tpu.data.pipeline import make_batches
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
    from fluid_llm_tpu.models.fluid_llm import FluidLLM

    cfg = Config(
        llm_backbone="fluid/llama-125m",
        half_precision=True,
        use_lora=False,
        batch_size=1,
        autoreg_seq_len=SEQ_LEN,
        seq_len=SEQ_LEN,
        resolution=238,
        flash_attention=True,
        pos_embedding_params={"pos_embedding_type": "rope_abs",
                              "input_emb_layer_dropout": 0.0},
        absolute_time_ids=True,
    )
    ds = SyntheticCylinderDataset(
        n_trajectories=1, resolution=238, seq_len=SEQ_LEN, mode="test",
        max_steps=600, absolute_time=True,
    )
    model = FluidLLM.build(cfg, ds.ds_props())
    batch = next(make_batches(ds, 1, shuffle=False))
    return model, batch


def trace(streaming: bool = False):
    import jax

    if streaming:
        from fluid_llm_tpu.rollout.streaming import generate_streaming

        model, batch = _build_streaming()
        states, _, _, bc_mask, pos = batch
        params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
        roll = jax.jit(
            lambda p, s, m, pid: generate_streaming(model, p, s, m, pid, PRED_STEPS)
        )
        init, bc_mask, pos = (
            jax.device_put(states[:, :1]), jax.device_put(bc_mask), jax.device_put(pos)
        )
        t0 = time.time()
        st, _ = roll(params, init, bc_mask, pos)
        float(st.mean())
        print(f"streaming: compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    else:
        model, batch = _build()
        _, (roll, params, init, bc_mask, pos) = _timed_roll(model, batch, "traced", n_rep=1)
    tdir = "/tmp/rollout_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        st, _ = roll(params, init, bc_mask, pos)
        float(st.mean())

    from jax.profiler import ProfileData

    pb = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))[-1]
    pd = ProfileData.from_file(pb)
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_op, per_cat = defaultdict(float), defaultdict(float)
            total = 0.0
            for ev in line.events:
                if ev.name.startswith("%while"):
                    continue  # parent event; children are listed separately
                per_op[ev.name[:130]] += ev.duration_ns
                m = re.match(r"%([a-z_-]+)", ev.name)
                per_cat[m.group(1) if m else "?"] += ev.duration_ns
                total += ev.duration_ns
            print(f"device busy inside the rollout: {total/1e6:.1f} ms "
                  f"({total/1e6/PRED_STEPS:.3f} ms/step)")
            print("\n== categories ==")
            for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:15]:
                print(f"  {v/1e6:8.2f} ms  {v/total*100:5.1f}%  {k}")
            print("\n== top ops ==")
            for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
                print(f"  {v/1e6:8.2f} ms  {k}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "attr"
    if mode == "trace":
        trace()
    elif mode == "trace_stream":
        trace(streaming=True)
    else:
        attr()


if __name__ == "__main__":
    main()
