"""Flash-attention kernel: exact parity vs the XLA reference in interpret mode.

On CPU the Pallas interpreter computes the same f32 math as the reference, so
tolerances are tight — this isolates logic errors from TPU MXU rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_llm_tpu.ops.flash_attention import _flash_forward, _reference_attention


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


def test_flash_no_nans_on_fully_masked_rows(rng):
    q = jnp.asarray(rng.normal(size=(1, 64, 2, 64)).astype(np.float32))
    valid = jnp.zeros((1, 64), bool)
    out = _flash_forward(q, q, q, valid, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
