"""Model forward / rollout / trainer integration tests on a tiny config.

Key equivalence test (SURVEY.md §4): the ``lax.scan`` rollout with its
fixed-shape masked window must match a Python-loop oracle that reproduces the
reference's deque semantics (``src/models/model.py:168-216``) using dense
(unpadded) windows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.config import Config
from fluid_llm_tpu.data.pipeline import make_batches
from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset
from fluid_llm_tpu.models.fluid_llm import FluidLLM
from fluid_llm_tpu.ops.patching import img_to_patch, patch_to_img
from fluid_llm_tpu.rollout.generate import gen_seq, generate
from fluid_llm_tpu.train.trainer import Trainer

TINY = dict(n_layers=2, d_model=64, n_heads=4, d_ff=128, max_pos=128, dropout=0.0)


def tiny_setup(seq_len=5, decoder="MLPGNN", use_lora=False, tiny_overrides=None, **cfg_kw):
    base = dict(
        llm_backbone="gpt2",
        half_precision=False,
        use_lora=use_lora,
        batch_size=2,
        autoreg_seq_len=seq_len,
        seq_len=seq_len,
        resolution=64,
        flash_attention=False,
        decoder_params={"type": decoder, "gnn_dim": 8, "gnn_hid_dim": 12,
                        "gnn_layers": 2, "gnn_heads": 1, "mlp_hid_dim": 32,
                        "dropout": 0.0, "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu", "zero_last_layer": False},
        encoder_params={"type": "MLP", "num_layers": 2, "hidden_dim": 32,
                        "activation": "leakyrelu"},
    )
    base.update(cfg_kw)  # callers may override any field, incl. the defaults above
    cfg = Config(**base)
    ds = SyntheticCylinderDataset(
        n_trajectories=2, resolution=64, seq_len=seq_len, mode="valid"
    )
    props = ds.ds_props()
    model = FluidLLM.build(cfg, props, **{**TINY, **(tiny_overrides or {})})
    batch = next(make_batches(ds, 2, shuffle=False))
    return cfg, ds, props, model, batch


@pytest.fixture(scope="module")
def setup():
    return tiny_setup()


def test_forward_shapes(setup):
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, next_state, diffs, bc_mask, pos = batch
    out = model.forward(params, states, pos)
    X, Y = props.out_tot_size
    assert out.shape == (2, props.seq_len, 3, X, Y)
    assert np.isfinite(np.asarray(out)).all()

    see = model.forward_see_init(params, states, pos)
    assert see.shape == out.shape


def test_masked_window_equals_dense_forward(setup):
    """A full-valid mask must reproduce the dense forward exactly."""
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    dense = model.forward(params, states, pos)
    masked = model.forward(
        params, states, pos, frame_valid=jnp.ones(states.shape[:2], bool)
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(masked), atol=1e-6)


def test_partial_window_matches_truncated_dense(setup):
    """Invalid tail frames must not affect valid outputs (causal masking)."""
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    k = 2
    valid = jnp.arange(states.shape[1])[None, :] < k
    valid = jnp.broadcast_to(valid, states.shape[:2])
    garbage = states.at[:, k:].set(999.0)
    masked = model.forward(params, garbage, pos, frame_valid=valid)
    dense = model.forward(params, states[:, :k], pos[:, :k])
    np.testing.assert_allclose(
        np.asarray(masked[:, :k]), np.asarray(dense), atol=2e-5
    )


def reference_generate_oracle(model, params, init_states, bc_mask, position_ids, n_steps):
    """Python-loop reimplementation of the deque rollout (``model.py:168-216``)."""
    bs, init_len = init_states.shape[:2]
    W = model.max_ctx_len
    buff = [init_states[:, t:t + 1] for t in range(init_len)]
    all_states = [init_states]
    all_diffs = []
    for pred_step in range(init_len, init_len + n_steps):
        window = jnp.concatenate(buff[-W:], axis=1)
        seq_len = window.shape[1]
        # re-zeroed pos ids: spatial from frame 0, t = 0..seq_len-1
        spatial = position_ids[:, :1, :, :2]
        t_ids = jnp.broadcast_to(
            jnp.arange(seq_len)[None, :, None, None],
            (bs, seq_len, position_ids.shape[2], 1),
        ).astype(position_ids.dtype)
        wpos = jnp.concatenate(
            [jnp.broadcast_to(spatial, t_ids.shape[:3] + (2,)), t_ids], axis=-1
        )
        if model.cfg.see_init_state:
            pred = model.forward_see_init(params, window, wpos)
        else:
            pred = model.forward(params, window, wpos)
        diffs = img_to_patch(pred[:, -1:], model.ds_props)[:, 0]
        mask = bc_mask[:, pred_step - 1]
        diffs = jnp.where(mask, 0.0, diffs)
        nxt = buff[-1][:, 0] + diffs
        all_diffs.append(diffs)
        all_states.append(nxt[:, None])
        buff.append(nxt[:, None])
        buff = buff[-W:]
    return (
        jnp.concatenate(all_states, axis=1),
        jnp.stack(all_diffs, axis=1),
    )


def test_scan_rollout_matches_python_oracle(setup):
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos = batch
    n_steps = 4  # window grows 1->5 == max_ctx_len then slides? seq_len-1=4 -> W=5
    st, df = generate(model, params, states[:, :1], bc_mask, pos, n_steps)
    st_o, df_o = reference_generate_oracle(model, params, states[:, :1], bc_mask, pos, n_steps)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_o), atol=5e-4)


def test_scan_rollout_sliding_window(setup):
    """Longer than max_ctx_len: exercises the slide path."""
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos = batch
    W = model.max_ctx_len
    n_steps = W + 3
    # extend bc_mask in time (geometry static) so oracle indexing works
    bc_ext = jnp.concatenate([bc_mask] * 4, axis=1)[:, : n_steps + 1]
    st, df = generate(model, params, states[:, :1], bc_ext, pos, n_steps)
    st_o, df_o = reference_generate_oracle(model, params, states[:, :1], bc_ext, pos, n_steps)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_o), atol=1e-3)


def test_gen_seq_shapes(setup):
    cfg, ds, props, model, batch = setup
    params = model.init(jax.random.PRNGKey(0))
    states = batch[0]
    seq_len = states.shape[1]
    all_states, all_diffs = gen_seq(model, params, batch, seq_len)
    X, Y = props.out_tot_size
    assert all_states.shape == (2, seq_len + 1, 3, X, Y)
    assert all_diffs.shape == (2, seq_len, 3, X, Y)


@pytest.mark.parametrize("mode", ["autoreg", "gen", "notf"])
def test_train_steps_run_and_update(setup, mode):
    cfg, ds, props, model, batch = setup
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step_fn = {
        "autoreg": trainer.train_step_autoreg,
        "gen": trainer.train_step_gen,
        "notf": trainer.train_step_notf,
    }[mode]
    before = jax.tree_util.tree_leaves(state.trainable)[0].copy()
    trainable, opt_state, metrics = step_fn(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(metrics["N_RMSE"])).all()
    after = jax.tree_util.tree_leaves(trainable)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_val_step(setup):
    cfg, ds, props, model, batch = setup
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    metrics = trainer.val_step(state.trainable, state.frozen, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["N_RMSE"].shape == (2, batch[0].shape[1])


def test_lora_zero_init_is_identity():
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    params = model.init(jax.random.PRNGKey(0))
    assert "lora" in params
    states, _, _, _, pos = batch
    with_lora = model.forward(params, states, pos)
    # removing the adapters entirely must give identical outputs (B=0 at init)
    base = dict(params)
    base.pop("lora")
    without = model.forward(base, states, pos)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(without), atol=1e-6)


def test_lora_freezes_backbone():
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # backbone leaves must be frozen (None in trainable tree)
    assert state.trainable["backbone"] is None or all(
        v is None for v in jax.tree_util.tree_leaves(
            state.trainable["backbone"], is_leaf=lambda x: x is None)
    )
    bb_before = jax.tree_util.tree_leaves(state.frozen["backbone"])[0].copy()
    trainable, _, metrics = trainer.train_step_autoreg(
        state.trainable, state.frozen, state.opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    lora_after = jax.tree_util.tree_leaves(trainable["lora"])
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in lora_after)
    np.testing.assert_array_equal(
        np.asarray(bb_before), np.asarray(jax.tree_util.tree_leaves(state.frozen["backbone"])[0])
    )


def test_rollout_with_lora_params():
    """predict_frame_diff's sliced final block must honour LoRA adapters."""
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    params = model.init(jax.random.PRNGKey(0))
    # make the adapters non-trivial so divergence from base would show
    params["lora"] = jax.tree_util.tree_map(
        lambda x: x + 0.01, params["lora"]
    )
    states, _, _, bc_mask, pos = batch
    st, df = generate(model, params, states[:, :1], bc_mask, pos, 3)
    assert np.isfinite(np.asarray(st)).all()
    base = dict(params)
    base.pop("lora")
    st2, _ = generate(model, base, states[:, :1], bc_mask, pos, 3)
    assert not np.allclose(np.asarray(st[:, 1:]), np.asarray(st2[:, 1:]))


def test_cnn_decoder_matches_torch_oracle():
    """CNN decoder forward vs the reference PatchDecoder CNN path
    (``patch_decoder.py:22-30,44-52`` + ``CNN.py:4``): torch Conv1d stack over
    the RAW-reshaped token stream, with our weights copied in."""
    torch = pytest.importorskip("torch")
    from fluid_llm_tpu.config import DecoderConfig
    from fluid_llm_tpu.data.ds_props import DSProps
    from fluid_llm_tpu.models.decoders import patch_decoder_apply, patch_decoder_init

    props = DSProps(Nx_patch=3, Ny_patch=2, patch_size=(4, 4), seq_len=3)
    llm_dim = props.patch_in_dim  # 48: the CNN type requires out_dim == llm_dim
    cfg = DecoderConfig(
        type="CNN", num_layers=3, hidden_dim=32, activation="leakyrelu",
        zero_last_layer=False,
    )
    params = patch_decoder_init(jax.random.PRNGKey(3), llm_dim, props, cfg)
    bs, seq, n = 2, props.seq_len, props.N_patch
    tokens = jax.random.normal(jax.random.PRNGKey(4), (bs, seq, n, llm_dim))
    out = patch_decoder_apply(params, tokens, props, cfg)
    X, Y = props.out_tot_size
    assert out.shape == (bs, seq, X, Y, 3)

    # torch oracle
    convs = []
    for p in params["cnn"]:
        c_out, c_in = p["w"].shape[2], p["w"].shape[1]
        conv = torch.nn.Conv1d(c_in, c_out, kernel_size=3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(np.asarray(p["w"]).transpose(2, 1, 0)))
            conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        convs.append(conv)
    act = torch.nn.LeakyReLU()
    x = torch.tensor(np.asarray(tokens)).reshape(bs, seq * n, llm_dim)
    x = x.reshape(bs, llm_dim, seq * n)  # RAW reshape (patch_decoder.py:46)
    with torch.no_grad():
        for i, conv in enumerate(convs):
            x = conv(x)
            if i < len(convs) - 1:
                x = act(x)
    x = x.reshape(bs, seq * n, llm_dim)  # RAW reshape back (:52)
    ref = x.reshape(bs, seq, X, Y, 3).numpy()  # caller view (model.py:151)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_cnn_decoder_rejects_dim_mismatch():
    from fluid_llm_tpu.config import DecoderConfig
    from fluid_llm_tpu.data.ds_props import DSProps
    from fluid_llm_tpu.models.decoders import patch_decoder_init

    props = DSProps(Nx_patch=3, Ny_patch=2, patch_size=(4, 4), seq_len=3)
    with pytest.raises(ValueError, match="patch_in_dim == llm_dim"):
        patch_decoder_init(
            jax.random.PRNGKey(0), 64, props, DecoderConfig(type="CNN")
        )


def test_cnn_rollout_full_window_matches_oracle():
    """With a FULL initial context the window never holds invalid frames, so
    the CNN full-window rollout decode must match the deque oracle exactly
    (the partial-window deviation is documented in PARITY.md)."""
    # see_init off so max_ctx_len == the number of available init frames:
    # the window is genuinely full from the very first generated step
    cfg, ds, props, model, batch = tiny_setup(
        decoder="CNN",
        see_init_state=False,
        tiny_overrides=dict(d_model=props_dim_for_cnn(), n_heads=4),
    )
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos = batch
    W = model.max_ctx_len
    assert states.shape[1] >= W, "test needs a full initial window"
    n_steps = 3
    bc_ext = jnp.concatenate([bc_mask] * 3, axis=1)[:, : W + n_steps + 1]
    st, df = generate(model, params, states[:, :W], bc_ext, pos, n_steps)
    st_o, df_o = reference_generate_oracle(
        model, params, states[:, :W], bc_ext, pos, n_steps
    )
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_o), atol=5e-4)


def props_dim_for_cnn():
    """llm_dim the CNN decoder requires: patch_in_dim = 16*16*3."""
    return 768


@pytest.mark.parametrize("see_init,bos", [(False, True), (True, False), (False, False)])
def test_rollout_config_matrix(see_init, bos):
    """Rollout equivalence holds for all see_init/bos flag combinations."""
    cfg, ds, props, model, batch = tiny_setup(
        see_init_state=see_init, use_bos_token=bos
    )
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, bc_mask, pos = batch
    st, df = generate(model, params, states[:, :1], bc_mask, pos, 3)
    assert np.isfinite(np.asarray(st)).all()

    # oracle step 1: dense window of 1 frame
    wpos = pos[:, :1].at[:, :, :, 2].set(0)
    if see_init:
        pred = model.forward_see_init(params, states[:, :1], wpos)
    else:
        pred = model.forward(params, states[:, :1], wpos)
    diffs0 = img_to_patch(pred[:, -1:], model.ds_props)[:, 0]
    diffs0 = jnp.where(bc_mask[:, 0], 0.0, diffs0)
    np.testing.assert_allclose(np.asarray(df[:, 0]), np.asarray(diffs0), atol=5e-5)


def test_prepare_inference_params_exact(monkeypatch):
    """merge_lora + pack_qkv_params + stack_layers is an exact transform:
    full forward and the single-frame rollout agree with the unpacked
    adapter path.  Runs the opt-in scanned layout (FLUID_SCAN_LAYERS=1) so
    the stacked path is what the oracle checks."""
    monkeypatch.setenv("FLUID_SCAN_LAYERS", "1")
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    params = model.init(jax.random.PRNGKey(3))
    states, _, _, bc_mask, pos = batch

    packed = model.prepare_inference_params(params)
    assert "lora" not in packed
    # stacked scanned layout: the layer list became one pytree with a
    # leading n_layers axis (backbone.stack_layers)
    layers = packed["backbone"]["layers"]
    assert not isinstance(layers, list)
    assert "qkv" in layers["attn"] and "q" not in layers["attn"]
    n_layers = model.backbone_cfg.n_layers
    assert layers["attn"]["qkv"]["w"].shape[0] == n_layers

    ref = model.predict_diffs(params, states, pos)
    out = model.predict_diffs(packed, states, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    st_ref, _ = generate(model, params, states[:, :1], bc_mask, pos, 3)
    st_out, _ = generate(model, packed, states[:, :1], bc_mask, pos, 3)
    np.testing.assert_allclose(np.asarray(st_out), np.asarray(st_ref), atol=1e-4, rtol=1e-4)
