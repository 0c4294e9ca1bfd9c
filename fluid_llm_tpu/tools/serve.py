"""HTTP serving daemon: load a checkpoint, keep compiled rollouts warm,
serve trajectory-rollout requests.

The reference has no serving story beyond re-running ``src/inference.py``
per evaluation (``src/inference.py:150-191`` — model rebuilt, checkpoint
reloaded, programs recompiled every invocation).  This daemon is the
deployment counterpart: one process owns the chip, the checkpoint is
restored once, the rollout programs are compiled once per ``pred_steps``
bucket at startup, and each request is a single warm device call.

Request contract (``POST /v1/rollout``, JSON):

    {
      "states":     base64 float32 little-endian, shape (ctx, 3, H, W)
                    RAW grid frames (physical units, not normalized);
                    EVERY context frame conditions the rollout
                    (``start_state=ctx``); 1 <= ctx <= the model window
                    (rejected with 400 otherwise).  ctx=1 programs are
                    compiled at warmup; other ctx values compile lazily
                    on first use,
      "shape":      [ctx, 3, H, W],
      "mask":       base64 uint8, shape (H, W) — 1 outside the mesh
                    (boundary/exterior pixels, forced + excluded),
      "pred_steps": int,
      "start_step": int (default 0) — trajectory step of frame 0; only
                    meaningful for ``absolute_time_ids`` models,
    }

Response: ``{"states": b64 f32, "shape": [pred, 3, H, W], ...timings}`` —
predictions DEnormalized back to physical units on the client's grid (the
patch padding is cropped; ``flip_y`` models are flipped back).

Geometry (H, W, patch layout, normalization stats) is published at
``GET /v1/info``; ``GET /healthz`` is the liveness probe; ``GET /v1/stats``
reports request/error counters, per-program device-call counts, and request
latency percentiles (last 1024 requests).  Device access is serialized with
a lock (one chip); concurrent requests queue.

Usage:
    python -m fluid_llm_tpu.tools.serve --checkpoint_dir model_checkpoints \
        --load_no -1 --port 8474 --buckets 50,251
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, format="[%(name)s:%(levelname)s] %(message)s", force=True)
logger = logging.getLogger("fluid_llm_tpu.serve")


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode("ascii")


def _unb64(data: str, shape, dtype) -> np.ndarray:
    raw = base64.b64decode(data)
    arr = np.frombuffer(raw, dtype=dtype)
    expect = int(np.prod(shape))
    if arr.size != expect:
        raise ValueError(f"payload has {arr.size} elements, shape {shape} needs {expect}")
    return arr.reshape(shape)


class RolloutEngine:
    """Checkpoint + warm compiled rollout programs, one per pred-steps bucket.

    ``max_batch > 1`` adds request coalescing: a worker thread drains the
    queue for up to ``batch_window_ms`` after the first request and runs one
    BATCHED device call per bucket group (aggregate throughput scales
    ~linearly with batch at this model size — BENCHMARKS.md "Batched
    serving"). Singletons still run the bs=1 program so an idle daemon never
    pays the padded-batch cost.
    """

    def __init__(self, cfg, model, params, dataset, buckets, streaming: bool,
                 max_batch: int = 1, batch_window_ms: float = 10.0):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.dataset = dataset
        self.streaming = streaming
        self.buckets = sorted(set(int(b) for b in buckets))
        self.max_batch = int(max_batch)
        self.batch_window_s = batch_window_ms / 1e3
        self.pad_x, self.pad_y, self.nx, self.ny = dataset._probe()
        self.grid_hw = dataset.get_trajectory(0).mask.shape
        self._lock = threading.Lock()  # one chip: serialize device work
        self._rollouts = {}
        # observability (GET /v1/stats): counters + a bounded latency window
        from collections import deque

        self._stats_lock = threading.Lock()
        self._counters = {"requests": 0, "errors": 0, "device_calls": 0,
                          "device_ms_total": 0.0, "coalesced_groups": 0,
                          "padded_rows": 0}
        self._by_program: dict[str, int] = {}
        self._lat_ms = deque(maxlen=1024)

        if streaming:
            from fluid_llm_tpu.rollout.streaming import generate_streaming as _gen
        else:
            from fluid_llm_tpu.rollout.generate import generate as _gen
        self._gen = _gen
        for b in self.buckets:
            self._get_rollout(b, 1)

        self._queue = None
        if self.max_batch > 1:
            import queue as _queue

            self._queue = _queue.Queue()
            threading.Thread(target=self._batch_worker, daemon=True).start()

    def _get_rollout(self, bucket: int, ctx: int):
        """Compiled rollout program for (bucket, ctx) — all ``ctx`` context
        frames condition the prediction via ``start_state=ctx``.  ctx=1
        programs are built at startup/warmup; other ctx values compile
        lazily on first use (logged, since the caller pays the compile)."""
        key = (bucket, ctx)
        prog = self._rollouts.get(key)
        if prog is None:
            if ctx != 1:
                logger.info("compiling rollout program bucket=%d ctx=%d (lazy)", bucket, ctx)
            from fluid_llm_tpu.ops.patching import patch_to_img

            def _compact(p, batch, _b=bucket):
                # compact serving batch: ONLY the ctx context frames, one
                # bc_mask frame, one position-id frame cross the tunnel —
                # both rollouts read exactly init_states / bc_mask (clamped
                # dynamic_index, time-invariant content) / pos frame 0
                init, bcm, pos = batch
                st, df = self._gen(self.model, p, init, bcm, pos, _b)
                props = self.model.ds_props
                return patch_to_img(st, props), patch_to_img(df, props)

            prog = jax.jit(_compact)
            # insert under the (cheap) stats lock so stats() can snapshot
            # the dict without racing a resize (ADVICE r4) and without
            # waiting on the device lock; jit() above is lazy — the actual
            # compile happens on first call, not here
            with self._stats_lock:
                prog = self._rollouts.setdefault(key, prog)
        return prog

    # -- batch construction ---------------------------------------------

    def build_batch(self, grid_states: np.ndarray, grid_mask: np.ndarray,
                    bucket: int, start_step: int = 0):
        """Raw grid context frames -> the COMPACT serving batch
        ``(init_states (1, ctx, ...), bc_mask (1, 1, ...), pos (1, 1, ...))``.

        Only the ctx context frames cross the host->device tunnel: both
        rollouts consume exactly ``init_states``, a time-invariant
        ``bc_mask`` (indexed with a shape-clamped ``dynamic_index``, so one
        frame is value-identical to the padded sequence) and position-id
        frame 0 (``rollout/generate.py:70-76``, ``rollout/streaming.py:109``).
        The r4 layout patchified + shipped the FULL bucket-length padded
        window per request (~46 MB / ~11 s host+tunnel per 251-step request,
        measured via ``tools/serving_bench.py``); this is the fix.  Patch
        construction runs on the host CPU backend — eager jnp ops in a TPU
        process would otherwise pay one tunnel round-trip each."""
        import jax as _jax

        from fluid_llm_tpu.data.pipeline import position_ids, window_to_patches

        ds = self.dataset
        ctx = grid_states.shape[0]
        # a (ctx+1)-frame window yields exactly the ctx real input states;
        # the repeated last frame only feeds the unread next/diff targets
        small = np.concatenate([grid_states, grid_states[-1:]], axis=0)
        kw = dict(
            patch=ds.patch_size, pad_x=self.pad_x, pad_y=self.pad_y,
            flip_y=ds.flip_y, trim=ds.trim_patches, masked_norm=ds.masked_norm,
        )
        try:
            with _jax.default_device(_jax.devices("cpu")[0]):
                input_states, _, _, bc_mask = window_to_patches(
                    small, grid_mask, ds.means, ds.stds, **kw)
                input_states, bc_mask = np.asarray(input_states), np.asarray(bc_mask)
        except RuntimeError:  # no CPU backend: small eager ops, still cheap
            input_states, _, _, bc_mask = window_to_patches(
                small, grid_mask, ds.means, ds.stds, **kw)
        pos = position_ids(
            1, self.nx, self.ny,
            t_base=start_step if ds.absolute_time else 0,
            t_step=ds.seq_interval if ds.absolute_time else 1,
        )
        add_b = lambda a: np.asarray(a)[None]
        return (add_b(input_states), add_b(bc_mask[:1]), add_b(pos))

    # -- inference --------------------------------------------------------

    def pick_bucket(self, pred_steps: int) -> int:
        for b in self.buckets:
            if pred_steps <= b:
                return b
        raise ValueError(f"pred_steps {pred_steps} exceeds largest bucket {self.buckets[-1]}")

    def _validate(self, grid_states: np.ndarray, grid_mask: np.ndarray):
        if grid_states.shape[1:] != (3, *self.grid_hw):
            raise ValueError(
                f"states shape {grid_states.shape} != (ctx, 3, {self.grid_hw[0]}, {self.grid_hw[1]})"
            )
        ctx = grid_states.shape[0]
        max_ctx = self.model.max_ctx_len
        if not 1 <= ctx <= max_ctx:
            # every context frame conditions the rollout (start_state=ctx);
            # beyond the model window the extra frames could never be seen
            raise ValueError(
                f"context length {ctx} not in [1, {max_ctx}] (the model's "
                f"window; all context frames condition the rollout)"
            )
        if grid_mask.shape != self.grid_hw:
            raise ValueError(f"mask shape {grid_mask.shape} != {self.grid_hw}")

    def _device_rollout(self, bucket: int, ctx: int, batch) -> np.ndarray:
        """One (possibly batched) device call -> (bs, ctx+bucket, 3, H, W)."""
        rollout = self._get_rollout(bucket, ctx)
        with self._lock:
            t0 = time.monotonic()
            pred_states, _ = rollout(self.params, batch)
            out = np.asarray(pred_states)
        dt_ms = (time.monotonic() - t0) * 1e3
        key = f"bucket={bucket} ctx={ctx} bs={out.shape[0]}"
        with self._stats_lock:
            self._counters["device_calls"] += 1
            self._counters["device_ms_total"] += dt_ms
            self._by_program[key] = self._by_program.get(key, 0) + 1
        return out

    def predict(self, grid_states: np.ndarray, grid_mask: np.ndarray,
                pred_steps: int, start_step: int = 0) -> np.ndarray:
        """(ctx, 3, H, W) raw grid frames -> (pred_steps, 3, H, W) raw preds."""
        self._validate(grid_states, grid_mask)
        bucket = self.pick_bucket(pred_steps)
        ctx = grid_states.shape[0]
        batch = self.build_batch(grid_states, grid_mask.astype(bool), bucket, start_step)
        pred_states = self._device_rollout(bucket, ctx, batch)
        # rollout returns [ctx context frames ... preds]; drop the context
        # and keep pred_steps predictions (bucket may exceed the request)
        pred = pred_states[0, ctx:ctx + pred_steps]
        return self._to_client_grid(pred)

    # -- request coalescing (max_batch > 1) --------------------------------

    def request(self, grid_states: np.ndarray, grid_mask: np.ndarray,
                pred_steps: int, start_step: int = 0) -> np.ndarray:
        """Public request path: coalesced when batching is enabled."""
        t0 = time.monotonic()
        try:
            if self._queue is None:
                out = self.predict(grid_states, grid_mask, pred_steps, start_step)
            else:
                from concurrent.futures import Future

                fut = Future()
                self._validate(grid_states, grid_mask)  # fail fast on the caller thread
                self._queue.put((grid_states, grid_mask, pred_steps, start_step, fut))
                out = fut.result()
        except Exception:
            with self._stats_lock:
                self._counters["requests"] += 1
                self._counters["errors"] += 1
            raise
        with self._stats_lock:
            self._counters["requests"] += 1
            self._lat_ms.append((time.monotonic() - t0) * 1e3)
        return out

    def _batch_worker(self):
        import queue as _queue

        while True:
            group = [self._queue.get()]
            deadline = time.monotonic() + self.batch_window_s
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self._queue.get(timeout=remaining))
                except _queue.Empty:
                    break
            try:
                self._run_group(group)
            except Exception as e:  # pragma: no cover - belt and braces
                for *_ignored, fut in group:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_group(self, group):
        """Partition by (bucket, ctx), one batched device call per part.

        Intermediate group sizes (1 < n < max_batch) are PADDED up to
        ``max_batch`` by repeating the first sample and the results sliced:
        only batch sizes {1, max_batch} ever reach the device, so a
        coalesced group can never trigger a cold XLA compile while holding
        the device lock (warmup covers exactly those sizes)."""
        by_key: dict[tuple[int, int], list] = {}
        for req in group:
            states, mask, pred_steps, start_step, fut = req
            try:
                key = (self.pick_bucket(pred_steps), states.shape[0])
                by_key.setdefault(key, []).append(req)
            except ValueError as e:
                fut.set_exception(e)
        for (bucket, ctx), reqs in by_key.items():
            try:
                parts = [
                    self.build_batch(s, m.astype(bool), bucket, st)
                    for s, m, _p, st, _f in reqs
                ]
                n = len(parts)
                if 1 < n < self.max_batch:
                    parts = parts + [parts[0]] * (self.max_batch - n)
                with self._stats_lock:
                    if n > 1:
                        self._counters["coalesced_groups"] += 1
                    self._counters["padded_rows"] += len(parts) - n
                batch = tuple(np.concatenate(axis_parts, axis=0) for axis_parts in zip(*parts))
                preds = self._device_rollout(bucket, ctx, batch)
                for i, (_s, _m, pred_steps, _st, fut) in enumerate(reqs):
                    fut.set_result(self._to_client_grid(preds[i, ctx:ctx + pred_steps]))
            except Exception as e:
                for *_ignored, fut in reqs:
                    if not fut.done():
                        fut.set_exception(e)

    def _to_client_grid(self, pred: np.ndarray) -> np.ndarray:
        """Denormalize + undo the model-grid transforms (pad crop, y-flip)."""
        ds = self.dataset
        if ds.flip_y:
            pred = pred[..., ::-1]
        if not ds.trim_patches:  # trim changes geometry; serve the model grid
            (x0, x1), (y0, y1) = self.pad_x, self.pad_y
            H, W = pred.shape[-2:]
            pred = pred[..., x0:H - x1, y0:W - y1]
        return pred * ds.stds[None, :, None, None] + ds.means[None, :, None, None]

    def warmup(self):
        """Compile every program a request can reach without a lazy compile:
        ctx=1 at batch sizes {1, max_batch} per bucket (coalesced groups are
        padded to max_batch, so intermediate sizes never hit the device).
        ctx>1 programs compile lazily on first use."""
        zeros = np.zeros((1, 3, *self.grid_hw), np.float32)
        mask = np.zeros(self.grid_hw, bool)
        for b in self.buckets:
            for bs in {1, self.max_batch}:  # jit caches per input shape
                t0 = time.monotonic()
                batch = self.build_batch(zeros, mask, b)
                batch = tuple(np.repeat(a, bs, axis=0) for a in batch)
                out = self._device_rollout(b, 1, batch)
                float(out.mean())  # force completion (axon: block_until_ready can return early)
                logger.info("warm bucket %d bs=%d compiled+ran in %.1fs",
                            b, bs, time.monotonic() - t0)

    def stats(self) -> dict:
        """Serving observability rollup (``GET /v1/stats``): request/error
        counters, device-call counts per compiled program, and end-to-end
        request latency percentiles over the last 1024 requests."""
        with self._stats_lock:
            c = dict(self._counters)
            lat = sorted(self._lat_ms)
            by_prog = dict(self._by_program)
            # snapshot: a concurrent first request compiling a new
            # (bucket, ctx) program mutates the dict mid-iteration
            prog_keys = list(self._rollouts)
        out = {
            **c,
            "device_ms_total": round(c["device_ms_total"], 1),
            "by_program": by_prog,
            "compiled_programs": sorted(
                f"bucket={b} ctx={x}" for b, x in prog_keys
            ),
        }
        if lat:
            q = lambda p: round(lat[min(len(lat) - 1, int(p * len(lat)))], 1)
            out["latency_ms"] = {
                "count": len(lat), "mean": round(sum(lat) / len(lat), 1),
                "p50": q(0.50), "p95": q(0.95), "p99": q(0.99),
            }
        return out

    def info(self) -> dict:
        ds = self.dataset
        return {
            "backbone": self.cfg.llm_backbone,
            "streaming": self.streaming,
            "buckets": self.buckets,
            "max_batch": self.max_batch,
            "max_ctx": self.model.max_ctx_len,
            "grid_hw": list(self.grid_hw),
            "patch_size": list(ds.patch_size),
            "n_patch": self.nx * self.ny,
            "absolute_time_ids": ds.absolute_time,
            "means": [float(m) for m in ds.means],
            "stds": [float(s) for s in ds.stds],
            "trim_patches": ds.trim_patches,
            "flip_y": ds.flip_y,
        }


def load_engine(checkpoint_dir: str, load_no: int = -1, step: int | None = None,
                buckets=(50, 251), streaming: str = "auto",
                max_batch: int = 1, batch_window_ms: float = 10.0,
                quant: str | None = None) -> RolloutEngine:
    """Restore a run's checkpoint into a serving engine (mirrors
    ``inference.py:139-161``'s restore path).

    ``quant`` ("int8" | "nf4") stores the frozen backbone weights quantized
    (``ops/quant.py``) — an HBM-footprint lever for larger backbones / more
    concurrent trajectories (int8 is throughput-neutral, nf4 costs —
    measured tradeoffs in BENCHMARKS.md "Quantized-weight serving").
    """
    from fluid_llm_tpu.data import get_dataset
    from fluid_llm_tpu.main import init_state_and_mesh
    from fluid_llm_tpu.train import checkpoint as ckpt
    from fluid_llm_tpu.utils import set_seed

    set_seed()
    load_path = ckpt.get_save_folder(checkpoint_dir, load_no)
    cfg = ckpt.load_config(load_path)
    step = step if step is not None else ckpt.latest_step(load_path)
    logger.info("serving %s step_%s", load_path, step)

    probe_ds = get_dataset(cfg.replace(seq_len=cfg.autoreg_seq_len), mode="valid")
    model, _trainer, like, mesh = init_state_and_mesh(cfg, probe_ds.ds_props(), jax.random.PRNGKey(0))
    state = ckpt.restore_checkpoint(load_path, step, like)
    params = state.params
    if quant:
        from fluid_llm_tpu.models.lora import merge_lora
        from fluid_llm_tpu.ops.quant import quantize_backbone

        if "lora" in params:
            # fold adapters first: quantized leaves skip qkv packing and
            # would otherwise also skip the merge
            params = dict(params)
            params["backbone"] = merge_lora(params["backbone"], params["lora"],
                                            cfg.lora_config)
            del params["lora"]
        params["backbone"] = quantize_backbone(params["backbone"], mode=quant)
        logger.info("backbone weights stored as %s", quant)
    if mesh is None:
        params = model.prepare_inference_params(params)

    if streaming == "auto":
        # KV-cache serving needs the cache-stable positional scheme
        # (``rollout/streaming.py::_check_streaming_compat``)
        use_streaming = (
            model.backbone_cfg.pos == "rope"
            and cfg.pos_embedding_params.pos_embedding_type == "rope_abs"
            and cfg.absolute_time_ids
        )
    else:
        use_streaming = streaming in ("1", "true", "yes", "on")
    # the serving dataset provides geometry/stats only; its window must cover
    # the largest bucket so ds_props/seq arithmetic stays consistent
    serve_ds = get_dataset(cfg.replace(seq_len=max(buckets) + 1), mode="test")
    return RolloutEngine(cfg, model, params, serve_ds, buckets, use_streaming,
                         max_batch=max_batch, batch_window_ms=batch_window_ms)


class _Handler(BaseHTTPRequestHandler):
    engine: RolloutEngine = None  # set by serve()

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.info("%s %s", self.address_string(), fmt % args)

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        elif self.path == "/v1/info":
            self._send(200, self.engine.info())
        elif self.path == "/v1/stats":
            self._send(200, self.engine.stats())
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/v1/rollout":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            shape = req["shape"]
            states = _unb64(req["states"], shape, np.float32)
            mask = _unb64(req["mask"], shape[-2:], np.uint8)
            pred_steps = int(req["pred_steps"])
            start_step = int(req.get("start_step", 0))
            t0 = time.monotonic()
            pred = self.engine.request(states, mask, pred_steps, start_step)
            dt = time.monotonic() - t0
            self._send(200, {
                "states": _b64(pred.astype(np.float32)),
                "shape": list(pred.shape),
                "latency_s": round(dt, 4),
                "steps_per_s": round(pred_steps / dt, 2),
            })
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
        except Exception as e:  # keep the daemon alive on a bad request
            logger.exception("rollout failed")
            self._send(500, {"error": f"{type(e).__name__}: {e}"})


def serve(engine: RolloutEngine, host: str = "127.0.0.1", port: int = 8474) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,), {"engine": engine})
    httpd = ThreadingHTTPServer((host, port), handler)
    logger.info("serving on http://%s:%d (buckets %s, streaming=%s)",
                host, httpd.server_address[1], engine.buckets, engine.streaming)
    return httpd


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", default="model_checkpoints")
    parser.add_argument("--load_no", type=int, default=-1)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8474)
    parser.add_argument("--buckets", default="50,251",
                        help="pred-steps program sizes compiled at startup")
    parser.add_argument("--streaming", default="auto", choices=["auto", "on", "off"],
                        help="KV-cache serving (rope backbones; auto-detected)")
    parser.add_argument("--max_batch", type=int, default=1,
                        help="coalesce up to N concurrent requests per device call")
    parser.add_argument("--batch_window_ms", type=float, default=10.0,
                        help="how long to wait for co-batchable requests")
    parser.add_argument("--quant", default=None, choices=["int8", "nf4"],
                        help="store backbone weights quantized (HBM saver; "
                             "adapters are merged first)")
    parser.add_argument("--no_warmup", action="store_true")
    args = parser.parse_args(argv)

    # serving default: fast cold compile (BENCHMARKS.md "Cold compile")
    effort = os.environ.get("FLUID_COMPILE_EFFORT", "-0.3")
    if effort not in ("", "default"):
        try:
            jax.config.update("jax_exec_time_optimization_effort", float(effort))
        except Exception as e:
            logger.warning("compile-effort knob unavailable: %s", e)

    buckets = [int(b) for b in args.buckets.split(",")]
    engine = load_engine(args.checkpoint_dir, args.load_no, args.step,
                         buckets=buckets, streaming=args.streaming,
                         max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
                         quant=args.quant)
    if not args.no_warmup:
        engine.warmup()
    httpd = serve(engine, args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        httpd.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
