"""Serving daemon: batch construction, geometry round-trip, HTTP protocol.

The checkpoint-restore path ``serve.load_engine`` shares is covered by
``test_train_e2e.py``; here the engine is built directly from the tiny model
so the new surface (grid->batch construction, bucket dispatch, denormalize/
crop, the HTTP contract) runs on CPU.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from fluid_llm_tpu.data.pipeline import make_batches
from fluid_llm_tpu.tools import serve as srv

from test_model import tiny_setup


@pytest.fixture(scope="module")
def engine():
    cfg, ds, props, model, batch = tiny_setup(seq_len=8, decoder="MLP")
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
    return srv.RolloutEngine(cfg, model, params, ds, buckets=[3, 6], streaming=False), ds


def _client_frames(ds, n=1):
    """Raw grid frames + mask from the synthetic dataset's first trajectory."""
    from fluid_llm_tpu.core.interp import resample_to_grid

    src = ds.get_trajectory(0)
    grid = np.asarray(resample_to_grid(
        src.node_states[:n], src.vert_idx, src.weights, src.mask))
    return grid, np.asarray(src.mask, np.uint8)


def test_predict_shapes_and_units(engine):
    eng, ds = engine
    grid, mask = _client_frames(ds)
    pred = eng.predict(grid, mask, pred_steps=3)
    # client-grid geometry: padding cropped back to the raw grid
    assert pred.shape == (3, 3, *grid.shape[-2:])
    assert np.isfinite(pred).all()
    # output is in PHYSICAL units: inside-mesh magnitudes comparable to input
    inside = ~mask.astype(bool)
    assert abs(pred[0, 0][inside].mean() - grid[0, 0][inside].mean()) < 10 * (
        abs(grid[0, 0][inside].mean()) + 1
    )


def test_bucket_dispatch(engine):
    eng, ds = engine
    grid, mask = _client_frames(ds)
    # pred_steps=2 runs in the 3-bucket, sliced to 2
    assert eng.predict(grid, mask, pred_steps=2).shape[0] == 2
    assert eng.pick_bucket(2) == 3
    assert eng.pick_bucket(4) == 6
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        eng.pick_bucket(7)


def test_build_batch_matches_dataset_sample(engine):
    """The serving-side compact batch must reproduce the dataset pipeline
    exactly on the frames the rollout reads (init states, bc_mask frame,
    position-id frame 0)."""
    eng, ds = engine
    sample = ds.sample(0, step_num=0)
    grid, mask = _client_frames(ds, n=1)
    init, bcm, pos = eng.build_batch(grid, mask.astype(bool), bucket=3, start_step=0)
    assert init.shape[:2] == (1, 1) and bcm.shape[:2] == (1, 1) and pos.shape[:2] == (1, 1)
    np.testing.assert_allclose(
        np.asarray(init[0, 0]), np.asarray(sample[0][0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(bcm[0, 0]), np.asarray(sample[3][0]))
    np.testing.assert_array_equal(pos[0], sample[4][:1])


def test_serving_bench_modes(engine):
    """serving_bench drives the real engine in both group modes: the serial
    burst runs bs=1 calls only; the batched burst coalesces into one bs=N
    device call — both return finite full-bucket rollouts per stream."""
    from fluid_llm_tpu.tools import serving_bench as sb

    eng, ds = engine
    grid, mask = _client_frames(ds)
    frames = [grid, grid * 1.1]
    serial = sb.run_mode("serial", eng.cfg, eng.model, eng.params, ds,
                         3, frames, mask, reps=2, streaming=False)
    batched = sb.run_mode("batched", eng.cfg, eng.model, eng.params, ds,
                          3, frames, mask, reps=2, streaming=False)
    assert serial["aggregate_steps_per_sec"] > 0
    assert batched["coalesced_groups"] >= 1
    assert serial["coalesced_groups"] == 0


def test_request_coalescing_matches_unbatched(engine):
    """max_batch>1: concurrent requests coalesce into one batched device
    call and return per-request results identical to the bs=1 path."""
    from concurrent.futures import ThreadPoolExecutor

    eng, ds = engine
    batched = srv.RolloutEngine(eng.cfg, eng.model, eng.params, ds,
                                buckets=[3, 6], streaming=False,
                                max_batch=3, batch_window_ms=500.0)
    grid, mask = _client_frames(ds)
    grid2 = grid * 1.1  # a second, different trajectory context

    calls = []
    orig = batched._device_rollout
    batched._device_rollout = (
        lambda b, c, batch: calls.append(batch[0].shape[0]) or orig(b, c, batch)
    )

    with ThreadPoolExecutor(3) as pool:
        futs = [
            pool.submit(batched.request, grid, mask, 3, 0),
            pool.submit(batched.request, grid2, mask, 2, 0),
            pool.submit(batched.request, grid, mask, 5, 0),  # other bucket
        ]
        out = [f.result(timeout=300) for f in futs]

    np.testing.assert_allclose(out[0], eng.predict(grid, mask, 3), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[1], eng.predict(grid2, mask, 2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[2], eng.predict(grid, mask, 5), rtol=1e-4, atol=1e-5)
    # the two bucket-3 requests shared one batched device call, PADDED to
    # max_batch so only pre-warmed batch sizes ever reach the device
    assert sorted(calls) == [1, 3]


def test_multi_frame_context_conditions_rollout(engine):
    """ctx>1: every context frame conditions the prediction
    (start_state=ctx wired through the compiled programs)."""
    import jax.numpy as jnp
    from fluid_llm_tpu.ops.patching import patch_to_img
    from fluid_llm_tpu.rollout.generate import generate

    eng, ds = engine
    grid, mask = _client_frames(ds, n=2)
    pred = eng.predict(grid, mask, pred_steps=2)
    assert pred.shape == (2, 3, *grid.shape[-2:])
    assert np.isfinite(pred).all()
    # must equal the underlying rollout conditioned on both context frames
    init, bcm, pos = (jnp.asarray(a) for a in
                      eng.build_batch(grid, mask.astype(bool), bucket=3))
    assert init.shape[1] == 2  # both context frames cross to the device
    st, _ = generate(eng.model, eng.params, init, bcm, pos, 3)
    ref = eng._to_client_grid(
        np.asarray(patch_to_img(st, eng.model.ds_props))[0, 2:4])
    np.testing.assert_allclose(pred, ref, rtol=1e-4, atol=1e-5)


def test_rejects_oversized_context(engine):
    eng, ds = engine
    W = eng.model.max_ctx_len
    grid, mask = _client_frames(ds, n=1)
    too_long = np.repeat(grid, W + 1, axis=0)
    with pytest.raises(ValueError, match="context length"):
        eng.predict(too_long, mask, pred_steps=2)


def test_http_round_trip(engine):
    eng, ds = engine
    httpd = srv.serve(eng, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/v1/info", timeout=30) as r:
            info = json.load(r)
        assert info["buckets"] == [3, 6]
        assert info["grid_hw"] == list(_client_frames(ds)[1].shape)

        grid, mask = _client_frames(ds)
        body = json.dumps({
            "states": srv._b64(grid.astype(np.float32)),
            "shape": list(grid.shape),
            "mask": srv._b64(mask),
            "pred_steps": 2,
        }).encode()
        req = urllib.request.Request(f"{base}/v1/rollout", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        pred = srv._unb64(out["states"], out["shape"], np.float32)
        assert pred.shape == (2, 3, *grid.shape[-2:])
        assert np.isfinite(pred).all()
        assert out["steps_per_s"] > 0

        # observability: the rollout above must show up in /v1/stats
        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] >= 1 and stats["device_calls"] >= 1
        assert stats["latency_ms"]["count"] >= 1
        assert stats["latency_ms"]["p50"] > 0
        assert any(k.startswith("bucket=3") for k in stats["by_program"])

        # malformed request -> 400, daemon stays alive
        bad = urllib.request.Request(f"{base}/v1/rollout", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        httpd.shutdown()


def test_quantized_engine_matches_dense(engine):
    """--quant serving: int8 backbone storage (adapters merged first) must
    reproduce the dense engine's rollout within quantization tolerance."""
    from fluid_llm_tpu.ops.quant import quantize_backbone

    eng, ds = engine
    cfg, _, props, model, _ = tiny_setup(seq_len=8, decoder="MLP")
    raw = model.init(jax.random.PRNGKey(0))  # same seed as the fixture
    qparams = dict(raw)
    qparams["backbone"] = quantize_backbone(qparams["backbone"], mode="int8")
    qparams = model.prepare_inference_params(qparams)
    qeng = srv.RolloutEngine(cfg, model, qparams, ds, buckets=[3], streaming=False)

    grid, mask = _client_frames(ds)
    dense = eng.predict(grid, mask, pred_steps=3)
    quant = qeng.predict(grid, mask, pred_steps=3)
    assert np.isfinite(quant).all()
    scale = np.abs(dense).mean() + 1e-6
    assert np.abs(quant - dense).mean() / scale < 0.05
