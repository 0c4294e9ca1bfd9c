"""Streaming KV-cache rollout (``rollout/streaming.py``) equivalence tests.

The streaming path's contract is sliding-window LLM serving: every token is
encoded once, new queries see the pinned sinks plus the last R frames.  That
is mathematically equal to dense attention under a banded mask (each
token's representation depends only on earlier tokens, identically in both
formulations), which is what these tests pin:

- backbone level, WITH eviction: step-by-step ``apply_streaming`` against
  one dense ``apply`` call with a banded ``allowed_override``;
- end to end, no eviction: ``generate_streaming`` against a python loop
  that re-runs a dense forward over the full (frozen-embedding) prefix each
  step — equal because causal attention makes re-encoding idempotent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data.pipeline import make_batches
from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
from fluid_llm_tpu.models import backbone as bb
from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.ops.patching import img_to_patch
from fluid_llm_tpu.rollout.streaming import generate_streaming

TINY_LLAMA = dict(n_layers=2, d_model=64, n_heads=4, d_ff=128, max_pos=4096, dropout=0.0)


def llama_setup(seq_len=5, ds_kw=None, use_lora=False, **cfg_kw):
    cfg = Config(
        llm_backbone="fluid/llama-125m",
        half_precision=False,
        use_lora=use_lora,
        batch_size=2,
        autoreg_seq_len=seq_len,
        seq_len=seq_len,
        resolution=64,
        flash_attention=False,
        absolute_time_ids=True,
        pos_embedding_params={"pos_embedding_type": "rope_abs",
                              "input_emb_layer_dropout": 0.0},
        decoder_params={"type": "MLP", "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu", "zero_last_layer": False},
        encoder_params={"type": "MLP", "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu"},
        **cfg_kw,
    )
    ds = SyntheticCylinderDataset(
        n_trajectories=2, resolution=64, seq_len=seq_len, mode="valid",
        **{"absolute_time": True, **(ds_kw or {})},
    )
    model = FluidLLM.build(cfg, ds.ds_props(), **TINY_LLAMA)
    batch = next(make_batches(ds, 2, shuffle=False))
    return cfg, ds, model, batch


@pytest.fixture(scope="module")
def setup():
    return llama_setup()


def _token_stream(model, params, states, pos_ids):
    """[bos, dup(frame0 @ t=0), frame f @ t=f ...] embeddings + positions +
    per-token frame index (-1 for sinks), exactly as the streaming path
    builds them."""
    cfg = model.cfg
    bs, T, n_patch = states.shape[:3]
    spatial = pos_ids[:, :1, :, :2]

    def emb(f, t):
        tt = jnp.full((bs, 1, n_patch, 1), t, pos_ids.dtype)
        return model.embed_frames(
            params, states[:, f:f + 1], jnp.concatenate([spatial, tt], axis=-1)
        )

    chunks = [jnp.broadcast_to(
        params["bos"].astype(jnp.float32)[None, None, :],
        (bs, 1, model.backbone_cfg.embed_dim),
    )]
    frame_of = [-1]
    chunks.append(emb(0, 0))
    frame_of += [-1] * n_patch
    for f in range(T):
        chunks.append(emb(f, f))
        frame_of += [f] * n_patch
    x = jnp.concatenate(chunks, axis=1)
    positions = jnp.arange(x.shape[1], dtype=jnp.int32)
    return x, positions, np.asarray(frame_of)


def test_streaming_equals_banded_dense_with_eviction(setup):
    """apply_streaming stepped frame-by-frame (ring eviction active) ==
    one dense apply under the banded mask."""
    cfg, ds, model, batch = setup
    bcfg = model.backbone_cfg
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos_ids = batch
    bs, T, n_patch = states.shape[:3]
    R = 3  # ring of 3 frames while T=5 -> frames 3,4 evict 0,1

    x, positions, frame_of = _token_stream(model, params, states, pos_ids)
    n_sink = 1 + n_patch

    # --- streaming: prefill sinks, then append frames one at a time -------
    cache = bb.init_streaming_cache(bcfg, bs, n_sink, R, n_patch)
    _, cache = bb.apply_streaming(
        params["backbone"], bcfg, x[:, :n_sink], positions[:n_sink], cache, 0,
        prefill=True,
    )
    stream_out = []
    for f in range(T):
        lo = n_sink + f * n_patch
        y, cache = bb.apply_streaming(
            params["backbone"], bcfg, x[:, lo:lo + n_patch],
            positions[lo:lo + n_patch], cache, f % R,
        )
        stream_out.append(np.asarray(y))

    # --- dense oracle: banded mask over the full token stream -------------
    qf = frame_of[:, None]  # query frame (-1 sink)
    kf = frame_of[None, :]
    causal = positions[:, None] >= positions[None, :]
    in_band = (kf == -1) | (kf > qf - R)
    allowed = jnp.asarray(np.asarray(causal) & in_band)[None, None]
    pos_b = jnp.broadcast_to(positions[None, :], (bs, x.shape[1]))
    dense = bb.apply(
        params["backbone"], bcfg, x,
        positions_override=pos_b, allowed_override=allowed,
    )

    for f in range(T):
        lo = n_sink + f * n_patch
        np.testing.assert_allclose(
            stream_out[f], np.asarray(dense[:, lo:lo + n_patch]),
            atol=2e-5, rtol=1e-5, err_msg=f"frame {f}",
        )


def test_generate_streaming_matches_dense_reencode_oracle(setup):
    """No eviction: the end-to-end streaming rollout == a python loop that
    re-runs a dense forward over the frozen-embedding prefix every step."""
    cfg, ds, model, batch = setup
    bcfg = model.backbone_cfg
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
    states, _, _, bc_mask, pos_ids = batch
    bs, T, n_patch = states.shape[:3]
    n_steps = 3
    init = states[:, :1]
    assert model.max_ctx_len >= 1 + n_steps  # no eviction in this regime

    got_states, got_diffs = jax.jit(
        lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps)
    )(params, init)

    # oracle loop — t ids are ABSOLUTE: the dataset's base step + frame index
    spatial = pos_ids[:, :1, :, :2]
    t0 = int(pos_ids[0, 0, 0, 2])
    assert t0 == 100  # valid/test windows start at the fixed step 100

    def emb(state, t):
        tt = jnp.full((bs, 1, n_patch, 1), t, pos_ids.dtype)
        return model.embed_frames(
            params, state[:, None], jnp.concatenate([spatial, tt], axis=-1)
        )

    bos = jnp.broadcast_to(
        params["bos"].astype(bcfg.dtype)[None, None, :], (bs, 1, bcfg.embed_dim)
    )
    toks = [bos, emb(init[:, 0], t0)]  # sinks: bos + pinned init dup
    cur = init[:, 0]
    oracle_states, oracle_diffs = [], []
    for i in range(n_steps):
        f = i  # frame index being appended (init_len=1)
        toks.append(emb(cur, t0 + f))
        xfull = jnp.concatenate(toks, axis=1)
        pos_b = jnp.broadcast_to(
            jnp.arange(xfull.shape[1], dtype=jnp.int32)[None], xfull.shape[:2]
        )
        out = bb.apply(params["backbone"], bcfg, xfull, positions_override=pos_b)
        diff_img = model.decode_frame_tokens(params, out[:, -n_patch:])
        diffs = img_to_patch(diff_img[:, None], model.ds_props)[:, 0]
        step_idx = min(f, bc_mask.shape[1] - 1)
        diffs = jnp.where(bc_mask[:, step_idx], 0.0, diffs)
        cur = cur + diffs
        oracle_states.append(np.asarray(cur))
        oracle_diffs.append(np.asarray(diffs))

    np.testing.assert_allclose(
        np.asarray(got_diffs), np.stack(oracle_diffs, axis=1), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_states[:, 1:]), np.stack(oracle_states, axis=1),
        atol=2e-5, rtol=1e-5,
    )


def test_streaming_long_rollout_with_eviction_is_finite(setup):
    """Past the ring capacity the rollout keeps producing finite states."""
    cfg, ds, model, batch = setup
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = model.max_ctx_len + 4  # forces ring wrap
    got_states, _ = jax.jit(
        lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps)
    )(params, states[:, :1])
    assert got_states.shape[1] == 1 + n_steps
    assert np.isfinite(np.asarray(got_states)).all()


def test_absolute_time_exact_rollout_matches_oracle():
    """``absolute_time_ids``: dataset t ids carry the trajectory step, and the
    exact (re-encoding) rollout assigns each window frame its absolute t —
    pinned against a python deque-loop oracle, sliding included."""
    cfg, ds, model, batch = llama_setup()  # absolute time is the default here
    from fluid_llm_tpu.rollout.generate import generate

    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos_ids = batch
    bs, T, n_patch = states.shape[:3]
    # dataset check: valid/test windows start at the fixed step 100
    assert int(pos_ids[0, 0, 0, 2]) == 100 and int(pos_ids[0, 1, 0, 2]) == 101

    W = model.max_ctx_len
    n_steps = W + 2  # force the slide path
    bc_ext = jnp.concatenate([bc_mask] * 4, axis=1)[:, : n_steps + 1]
    st, df = generate(model, params, states[:, :1], bc_ext, pos_ids, n_steps)

    # oracle: dense deque windows with absolute t ids
    spatial = pos_ids[:, :1, :, :2]
    t0 = int(pos_ids[0, 0, 0, 2])
    buff = [states[:, 0:1]]
    frame_ts = [t0]
    oracle_states, oracle_diffs = [], []
    for step in range(n_steps):
        window = jnp.concatenate(buff[-W:], axis=1)
        ts = frame_ts[-W:]
        seq = window.shape[1]
        t_ids = jnp.asarray(ts, pos_ids.dtype)[None, :, None, None]
        wpos = jnp.concatenate(
            [jnp.broadcast_to(spatial, (bs, seq, n_patch, 2)),
             jnp.broadcast_to(t_ids, (bs, seq, n_patch, 1))], axis=-1,
        )
        pred = model.forward_see_init(params, window, wpos)
        diffs = img_to_patch(pred[:, -1:], model.ds_props)[:, 0]
        diffs = jnp.where(bc_ext[:, min(step, bc_ext.shape[1] - 1)], 0.0, diffs)
        nxt = buff[-1][:, 0] + diffs
        oracle_diffs.append(np.asarray(diffs))
        oracle_states.append(np.asarray(nxt))
        buff.append(nxt[:, None])
        frame_ts.append(frame_ts[-1] + 1)

    np.testing.assert_allclose(
        np.asarray(df), np.stack(oracle_diffs, axis=1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(st[:, 1:]), np.stack(oracle_states, axis=1), atol=1e-3
    )


def test_decode_attention_kernel_matches_xla(monkeypatch):
    """The Pallas decode-attention kernel (interpret mode on CPU) must equal
    the XLA sink+ring attention through the full streaming rollout,
    including ring eviction.  Needs head_dim>=32 and n_heads*hd % 128 == 0
    (``ops/decode_attention.supported``), so a wider tiny model."""
    cfg, ds, _, batch = llama_setup()
    model = FluidLLM.build(
        cfg, ds.ds_props(), n_layers=2, d_model=128, n_heads=4, d_ff=128,
        max_pos=4096, dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = model.max_ctx_len + 2  # slides: eviction + slot rewrite covered

    from fluid_llm_tpu.ops import decode_attention as da
    assert da.supported(model.backbone_cfg)

    monkeypatch.setenv("FLUID_STREAM_ATTN", "xla")
    ref_states, ref_diffs = generate_streaming(
        model, params, states[:, :1], bc_mask, pos_ids, n_steps
    )
    monkeypatch.setenv("FLUID_STREAM_ATTN", "interpret")
    got_states, got_diffs = generate_streaming(
        model, params, states[:, :1], bc_mask, pos_ids, n_steps
    )
    np.testing.assert_allclose(
        np.asarray(got_states), np.asarray(ref_states), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_diffs), np.asarray(ref_diffs), atol=2e-5, rtol=1e-5
    )


def test_streaming_sharded_matches_single(setup):
    """Streaming serving composes with the device mesh: params sharded over
    (data, fsdp, model) produce the same rollout (tensor-parallel serving —
    the LLaMA-7B-on-v5e-8 shape, scaled down)."""
    from fluid_llm_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    cfg, ds, model, batch = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = 4

    ref_states, ref_diffs = jax.jit(
        lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps)
    )(params, states[:, :1])

    mesh = make_mesh(cfg.parallel.__class__(data_axis=2, fsdp_axis=1, model_axis=4))
    sp = shard_params(params, mesh, cfg.parallel.__class__(fsdp_axis=1, model_axis=4))
    sb = shard_batch(batch, mesh)
    got_states, got_diffs = jax.jit(
        lambda p, s: generate_streaming(model, p, s, sb[3], sb[4], n_steps)
    )(sp, sb[0][:, :1])

    np.testing.assert_allclose(
        np.asarray(got_states), np.asarray(ref_states), atol=2e-5, rtol=1e-5
    )


def test_streaming_with_nf4_quantized_backbone(setup):
    """Streaming decode reads quantized weight storage through the same
    ``materialize_w`` path — packed nf4 backbone serves without changes."""
    from fluid_llm_tpu.ops.quant import quantize_backbone

    cfg, ds, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = 3

    ref, _ = jax.jit(
        lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps)
    )(params, states[:, :1])

    qparams = dict(params, backbone=quantize_backbone(params["backbone"], mode="nf4"))
    got, _ = jax.jit(
        lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps)
    )(qparams, states[:, :1])

    assert np.isfinite(np.asarray(got)).all()
    # nf4 is lossy; demand closeness, not equality
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.5, err


def test_streaming_merges_adapters_on_the_fly():
    """Raw LoRA-carrying params (the mesh path skips the host-side merge)
    must serve IDENTICALLY to explicitly merged params — not silently drop
    the adapters."""
    cfg, ds, model, batch = llama_setup(use_lora=True)
    raw = model.init(jax.random.PRNGKey(0))
    assert "lora" in raw
    states, _, _, bc_mask, pos_ids = batch
    n_steps = 2

    run = jax.jit(lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps))
    got_raw, _ = run(raw, states[:, :1])
    got_merged, _ = run(model.prepare_inference_params(raw), states[:, :1])
    np.testing.assert_allclose(
        np.asarray(got_raw), np.asarray(got_merged), atol=2e-5, rtol=1e-5
    )


def test_streaming_scanned_layout_matches_unrolled(monkeypatch):
    """The opt-in scanned-layer layout (FLUID_SCAN_LAYERS=1 — stacked params,
    lax.scan over blocks, cache as scan xs/ys) serves identically to the
    default unrolled path."""
    cfg, ds, model, batch = llama_setup(use_lora=False)
    raw = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos_ids = batch
    n_steps = 3

    run = jax.jit(lambda p, s: generate_streaming(model, p, s, bc_mask, pos_ids, n_steps))
    unrolled = model.prepare_inference_params(raw)
    assert isinstance(unrolled["backbone"]["layers"], list)
    got_u, _ = run(unrolled, states[:, :1])

    monkeypatch.setenv("FLUID_SCAN_LAYERS", "1")
    stacked = model.prepare_inference_params(raw)
    assert not isinstance(stacked["backbone"]["layers"], list)
    got_s, _ = run(stacked, states[:, :1])
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(got_s), atol=2e-5, rtol=1e-5
    )


def test_streaming_rejects_relative_time_and_long_context(setup):
    cfg, ds, model, batch = setup
    states, _, _, bc_mask, pos_ids = batch
    params = model.prepare_inference_params(model.init(jax.random.PRNGKey(0)))

    rel_model = model.__class__(
        cfg=cfg.replace(absolute_time_ids=False), ds_props=model.ds_props,
        backbone_cfg=model.backbone_cfg,
    )
    with pytest.raises(ValueError, match="absolute_time_ids"):
        generate_streaming(rel_model, params, states[:, :1], bc_mask, pos_ids, 1)

    too_long = jnp.repeat(states, 3, axis=1)[:, : model.max_ctx_len + 1]
    with pytest.raises(ValueError, match="ring capacity"):
        generate_streaming(model, params, too_long, bc_mask, pos_ids, 1)


def test_streaming_rejects_learned_positions():
    """OPT/GPT-2 re-base learned positions per window — must be refused."""
    from fluid_llm_tpu.rollout.streaming import _check_streaming_compat

    cfg = Config(
        llm_backbone="gpt2", half_precision=False, use_lora=False,
        batch_size=2, autoreg_seq_len=4, seq_len=4, resolution=64,
        flash_attention=False,
    )
    ds = SyntheticCylinderDataset(n_trajectories=1, resolution=64, seq_len=4, mode="valid")
    model = FluidLLM.build(cfg, ds.ds_props(), n_layers=2, d_model=64, n_heads=4, d_ff=128)
    with pytest.raises(ValueError, match="rotary-position"):
        _check_streaming_compat(model)
