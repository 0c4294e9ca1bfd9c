"""int8 weight-only quantization: round-trip accuracy + model forward path."""

import jax
import jax.numpy as jnp
import numpy as np

from fluid_llm_tpu.ops.quant import (
    dequantize_backbone,
    quantization_error,
    quantize_backbone,
    quantize_weight,
)

from test_model import tiny_setup


def test_quantize_round_trip(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 0.1
    qp = quantize_weight(w)
    assert qp["q"].dtype == jnp.int8
    rec = qp["q"].astype(jnp.float32) * qp["scale"]
    # absmax-symmetric int8: error bounded by scale/2 per column
    err = jnp.abs(rec - w)
    assert float(jnp.max(err / jnp.maximum(qp["scale"], 1e-12))) <= 0.5 + 1e-3


def test_quantized_backbone_forward_close():
    cfg, ds, props, model, batch = tiny_setup(use_lora=True)
    params = model.init(jax.random.PRNGKey(0))
    states, _, _, _, pos = batch
    ref = model.forward(params, states, pos)

    qparams = dict(params)
    qparams["backbone"] = quantize_backbone(params["backbone"])
    out = model.forward(qparams, states, pos)
    # int8 weights perturb outputs slightly but boundedly
    denom = float(jnp.std(ref)) + 1e-9
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.35, rel
    assert np.isfinite(np.asarray(out)).all()

    # dequantize round-trips the structure
    deq = dequantize_backbone(qparams["backbone"], jnp.float32)
    w0 = params["backbone"]["layers"][0]["attn"]["q"]["w"]
    w1 = deq["layers"][0]["attn"]["q"]["w"]
    assert w1.shape == w0.shape
    assert quantization_error(params["backbone"]) <= 0.51
