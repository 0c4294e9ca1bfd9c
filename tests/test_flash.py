"""Flash-attention kernel: exact parity vs the XLA reference in interpret mode.

On CPU the Pallas interpreter computes the same f32 math as the reference, so
tolerances are tight — this isolates logic errors from TPU MXU rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops.flash_attention import (
    _flash_forward,
    _reference_attention,
    flash_attention,
)


@pytest.mark.parametrize(
    "bs,L,H,hd,starts",
    [
        (2, 200, 4, 64, (150, 200)),  # one partially-valid batch row
        (1, 128, 2, 64, (1,)),  # only the first token valid
        (2, 300, 3, 64, (0, 37)),  # fully-invalid row (diagonal fallback)
        (1, 661, 12, 64, (601,)),  # reference sequence length
    ],
)
def test_flash_matches_reference_interpret(rng, bs, L, H, hd, starts):
    q = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    valid = jnp.asarray(np.stack([np.arange(L) < s for s in starts]))

    ref = _reference_attention(q, k, v, valid)
    out = _flash_forward(q, k, v, valid, interpret=True)
    # compare only valid rows: invalid-query outputs are unused garbage
    ok = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[ok], np.asarray(ref)[ok], atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "bs,L,H,hd,starts",
    [
        (2, 200, 2, 64, (150, 200)),
        (1, 300, 3, 64, (37,)),  # mostly-invalid keys
        (1, 661, 2, 64, (601,)),  # reference sequence length
    ],
)
def test_flash_backward_matches_reference_interpret(rng, bs, L, H, hd, starts):
    """Pallas dq/dk/dv kernels == autodiff through the XLA reference.

    Loss is restricted to valid query rows (invalid-row outputs are unused
    garbage in the model, exactly as in ``_reference_attention``'s contract).
    """
    q = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32))
    valid = jnp.asarray(np.stack([np.arange(L) < s for s in starts]))
    w = valid[:, :, None, None].astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum((flash_attention(q, k, v, valid, True) * w) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_reference_attention(q, k, v, valid) * w) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=f"d{name}"
        )


def test_flash_no_nans_on_fully_masked_rows(rng):
    q = jnp.asarray(rng.normal(size=(1, 64, 2, 64)).astype(np.float32))
    valid = jnp.zeros((1, 64), bool)
    out = _flash_forward(q, q, q, valid, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
