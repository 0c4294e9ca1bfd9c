"""Linear-recoverability probe for frozen random backbones.

Measures how much of the input embedding a linear (ridge) readout can
recover from a random-init backbone's output — the quantity that bounds
what a patch decoder can learn when the trunk is frozen (the LoRA/peft
anchor protocol, reference ``src/models/model.py:106-116``).

Finding (BENCHMARKS.md "350m tier"): pre-LN stacks keep the residual
identity path, so the input stays linearly recoverable (OPT-125m R²≈+0.55,
fluid/llama-350m ≈+0.11); OPT-350m's post-LN blocks
(``do_layer_norm_before=False``) re-normalise after every residual add and
destroy it (R²≈−0.06; flipping ONLY ``pre_ln`` at the same geometry gives
+0.16, so LN placement alone is the cause).  A frozen random post-LN backbone
therefore caps the whole model at the zero-diff persistence baseline —
which is exactly where 480 epochs of ``configs/r5_350m.yaml`` landed.

Run on CPU (no TPU needed):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -m fluid_llm_tpu.tools.postln_probe [backbone ...]
"""

from __future__ import annotations

import sys

import jax

# CPU is plenty for the probe, and forcing it here (before any devices()
# call) survives a wedged TPU tunnel + the sitecustomize early-latch quirk
# (CLAUDE.md).  Override with FLUID_PROBE_PLATFORM if you really want TPU.
jax.config.update("jax_platforms", __import__("os").environ.get("FLUID_PROBE_PLATFORM", "cpu"))

import numpy as np  # noqa: E402

from fluid_llm_tpu.models import backbone as bb  # noqa: E402


def readout_r2(name: str, n_seq: int = 768, seq_len: int = 8, seed: int = 0) -> float:
    """Held-out R² of a ridge readout input <- backbone(input), random init."""
    cfg = bb.preset(name)
    params = bb.init_params(jax.random.PRNGKey(seed), cfg)
    d_in = cfg.d_embed or cfg.d_model
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (n_seq, seq_len, d_in))
    y = bb.apply(params, cfg, x)
    if isinstance(y, tuple):
        y = y[0]

    yf = np.asarray(y, np.float64).reshape(-1, y.shape[-1])
    xf = np.asarray(x, np.float64).reshape(-1, d_in)
    n_train = int(yf.shape[0] * 0.75)
    y_tr, y_te = yf[:n_train], yf[n_train:]
    x_tr, x_te = xf[:n_train], xf[n_train:]
    mu = y_tr.mean(0)
    y_tr = y_tr - mu
    y_te = y_te - mu
    lam = 1e-2 * np.trace(y_tr.T @ y_tr) / y_tr.shape[1]
    w = np.linalg.solve(y_tr.T @ y_tr + lam * np.eye(y_tr.shape[1]), y_tr.T @ x_tr)
    resid = x_te - y_te @ w
    return float(1.0 - resid.var() / x_te.var())


def main(argv=None) -> None:
    names = (argv or sys.argv[1:]) or [
        "facebook/opt-125m",
        "facebook/opt-350m",
        "fluid/llama-350m",
    ]
    for name in names:
        r2 = readout_r2(name)
        print(f"{name}: held-out ridge readout R^2 = {r2:+.4f}")


if __name__ == "__main__":
    main()
