"""Reference torch-checkpoint import/export (``tools/reference_ckpt.py``).

Round-trip oracle: export our params into the reference's state_dict key
space (``src/models/model.py:26-99`` module tree, peft naming for adapters,
``torch.compile``'s ``_orig_mod.`` wrapper segments), pass it through a real
``torch.save``/``torch.load``, import it back, and require bit-exact trees.
"""

import io

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fluid_llm_tpu.tools.reference_ckpt import (  # noqa: E402
    export_state_dict,
    import_state_dict,
    load_reference_checkpoint,
)

from test_model import tiny_setup  # noqa: E402


def _torch_roundtrip(sd):
    buf = io.BytesIO()
    torch.save(sd, buf)
    buf.seek(0)
    return torch.load(buf, map_location="cpu", weights_only=False)


def _assert_trees_equal(got, want, path=""):
    if isinstance(want, dict):
        assert set(got) == set(want), f"{path}: keys {set(got)} != {set(want)}"
        for k in want:
            _assert_trees_equal(got[k], want[k], f"{path}.{k}")
    elif isinstance(want, (list, tuple)):
        assert len(got) == len(want), f"{path}: length mismatch"
        for i, (g, w) in enumerate(zip(got, want)):
            _assert_trees_equal(g, w, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32), err_msg=path
        )


def _roundtrip(model, params):
    sd = _torch_roundtrip(export_state_dict(model, params))
    return import_state_dict(model, sd)


def test_roundtrip_opt_lora_mlpgnn():
    """OPT family + DoRA adapters + MLPGNN decoder + learned positions + LN."""
    cfg, ds, props, model, batch = tiny_setup(
        use_lora=True,
        llm_backbone="facebook/opt-125m",
        pos_embedding_params={"pos_embedding_type": "pos", "in_emb_ln_eps": 1e-5,
                              "input_emb_layer_dropout": 0.0,
                              "init_pos_embed": "normal"},
    )
    params = model.init(jax.random.PRNGKey(0))
    assert "lora" in params and "bos" in params
    got = _roundtrip(model, params)
    _assert_trees_equal(got, jax.device_get(params))


def test_roundtrip_gpt2_mlp_decoder_cnn_encoder():
    cfg, ds, props, model, batch = tiny_setup(
        decoder="MLP",
        encoder_params={"type": "CNN", "num_layers": 2, "hidden_dim": 16,
                        "activation": "gelu"},
    )
    params = model.init(jax.random.PRNGKey(1))
    got = _roundtrip(model, params)
    _assert_trees_equal(got, jax.device_get(params))


def test_roundtrip_llama_rope():
    cfg, ds, props, model, batch = tiny_setup(
        llm_backbone="fluid/llama-125m",
        pos_embedding_params={"pos_embedding_type": "rope",
                              "input_emb_layer_dropout": 0.0},
    )
    params = model.init(jax.random.PRNGKey(2))
    assert "pos" not in params["input_emb"]  # rope carries no params
    got = _roundtrip(model, params)
    _assert_trees_equal(got, jax.device_get(params))


def test_compile_wrapper_segments_are_stripped():
    """``torch.compile`` on the backbone / decoder GNN inserts ``_orig_mod.``
    segments (``model.py:57-59``, ``GNN/decoders.py:211``)."""
    cfg, ds, props, model, batch = tiny_setup()
    params = model.init(jax.random.PRNGKey(3))
    sd = export_state_dict(model, params)
    wrapped = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            k = "backbone._orig_mod." + k[len("backbone."):]
        k = k.replace(".GNN.", ".GNN._orig_mod.")
        wrapped[k] = v
    # plus the reference's non-parameter buffers the importer must ignore
    wrapped["output_layer.decoder.mesh_edges"] = torch.zeros(2, 4)
    got = import_state_dict(model, wrapped)
    _assert_trees_equal(got, jax.device_get(params))


def test_unmapped_keys_are_rejected():
    cfg, ds, props, model, batch = tiny_setup()
    params = model.init(jax.random.PRNGKey(4))
    sd = export_state_dict(model, params)
    sd["totally_unknown.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmapped"):
        import_state_dict(model, sd)


def test_full_payload_file_roundtrip(tmp_path):
    """The reference's on-disk save format: ``{'params': cfg, 'state_dict',
    'optimizer', 'scheduler'}`` (``src/main.py:133-143``) — the embedded
    config dict rebuilds our Config."""
    import yaml

    cfg, ds, props, model, batch = tiny_setup()
    params = model.init(jax.random.PRNGKey(5))
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(cfg_yaml))
    with open(cfg_yaml) as f:
        cfg_dict = yaml.safe_load(f)
    payload = {
        "params": cfg_dict,
        "state_dict": export_state_dict(model, params),
        "optimizer": {"state": {}, "param_groups": []},
        "scheduler": {"last_epoch": 7},
    }
    path = tmp_path / "step_20.pt"
    torch.save(payload, str(path))

    sd, cfg2 = load_reference_checkpoint(str(path))
    assert cfg2.llm_backbone == cfg.llm_backbone
    got = import_state_dict(model, sd)
    _assert_trees_equal(got, jax.device_get(params))


def test_export_embed_table_handling():
    """The frozen HF token table is OMITTED by default (r4 shipped (4, d)
    zero placeholders, which torch rejects on size mismatch regardless of
    ``strict`` — ADVICE r4) and emitted verbatim when passed in."""
    cfg, ds, props, model, batch = tiny_setup(llm_backbone="facebook/opt-125m")
    params = model.init(jax.random.PRNGKey(7))

    sd = export_state_dict(model, params)
    embed_keys = [k for k in sd if "embed_tokens" in k or k.endswith("wte.weight")]
    assert embed_keys == []  # omitted, not mis-shaped placeholders

    vocab_d = (50272, model.backbone_cfg.d_embed or model.backbone_cfg.d_model)
    table = np.random.default_rng(0).normal(size=vocab_d).astype(np.float32)
    sd2 = export_state_dict(model, params, embed_tokens=table)
    key = "backbone.decoder.embed_tokens.weight"
    assert tuple(sd2[key].shape) == vocab_d  # strict-load-ready shape
    np.testing.assert_array_equal(np.asarray(sd2[key]), table)
    # the extra frozen leaf must not break the import roundtrip
    got = import_state_dict(model, _torch_roundtrip(sd2))
    _assert_trees_equal(got, jax.device_get(params))


def test_imported_params_run_forward():
    """Imported trees must be directly consumable by the model forward."""
    cfg, ds, props, model, batch = tiny_setup()
    params = model.init(jax.random.PRNGKey(6))
    got = import_state_dict(model, export_state_dict(model, params))
    states, next_state, diffs, bc_mask, pos = batch
    out_ref = model.forward(params, states, pos)
    out_imp = model.forward(got, states, pos)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_imp), rtol=0, atol=0)
