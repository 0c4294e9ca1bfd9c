"""Fused single-block attention for SHORT sequences (Pallas, TPU).

The reference workload runs causal attention at 601-672 tokens
(``src/inference.py:85-87`` rollout, ``configs/training1.yaml`` training).
The flash kernel (``ops/flash_attention.py``) tiles for LONG sequences and
loses below ~2k tokens; XLA's two-matmul formulation wins there but must
MATERIALISE the (H, L, L) f32 logits between QK^T and AV — at the anchor
shape that is ~21 MB written + read per layer, ~0.5 GB per rollout step:
about half the step's HBM traffic (BENCHMARKS.md roofline).

At short L the whole problem fits VMEM, so this kernel runs one (batch,
head) per grid step with NO HBM intermediate: s = QK^T (MXU, f32 accum) →
causal+valid mask → softmax → P·V (MXU).  Same math as
``backbone._attention_xla`` including the forced-diagonal quirk (invalid
query rows keep one finite logit; their outputs are unused).

Forward-only fusion: the backward falls back to the XLA formulation via
``jax.vjp`` recompute (training keeps its measured-optimal path; the win
targeted here is the inference rollout, which takes no gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one (L, L) f32 score matrix + q/k/v/o must fit VMEM
_MAX_TOKENS = 1536


_BLOCK_Q = 128  # bounds Mosaic's live vreg set; K stays whole per program


def _kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, *, H):
    # q/o: (1, BQ, hd); k/v: (1, L, hd); valid: (1, L) f32 (1.0 = real)
    BQ = q_ref.shape[1]
    L = k_ref.shape[1]
    scale = q_ref.shape[2] ** -0.5
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, L) f32
    rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, L), 1)
    key_ok = valid_ref[0] > 0.0  # (L,) bool, f32 compare (Mosaic 16-bit cmp)
    allowed = (cols <= rows) & (key_ok[None, :] | (cols == rows))
    s = jnp.where(allowed, s, jnp.float32(-1e30))
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(q, k, v, valid, interpret=False):
    # q/k/v: (bs, L, H, hd) -> grid (bs*H, nq); query rows blocked, K whole
    bs, L, H, hd = q.shape
    qt = q.transpose(0, 2, 1, 3).reshape(bs * H, L, hd)
    kt = k.transpose(0, 2, 1, 3).reshape(bs * H, L, hd)
    vt = v.transpose(0, 2, 1, 3).reshape(bs * H, L, hd)
    bq = min(_BLOCK_Q, L)
    nq = pl.cdiv(L, bq)
    qrow = pl.BlockSpec((1, bq, hd), lambda bh, qi: (bh, qi, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, L, hd), lambda bh, qi: (bh, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H),
        grid=(bs * H, nq),
        in_specs=[
            qrow, full, full,
            pl.BlockSpec((1, L), lambda bh, qi: (bh // H, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qrow,
        out_shape=jax.ShapeDtypeStruct((bs * H, L, hd), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, valid.astype(jnp.float32))
    return out.reshape(bs, H, L, hd).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v, valid):
    """``backbone._attention_xla`` with its ``make_masks`` mask — the oracle
    and the recompute backward."""
    bs, L = q.shape[:2]
    scale = q.shape[-1] ** -0.5
    causal = jnp.tril(jnp.ones((L, L), bool))
    allowed = causal[None, :, :] & valid[:, None, :]
    allowed = allowed | jnp.eye(L, dtype=bool)[None]
    allowed = allowed[:, None]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(allowed, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def short_attention(q, k, v, valid, interpret: bool = False):
    """Causal+valid attention, (bs, L, H, hd) — fused, no HBM logits."""
    return _call(q, k, v, valid, interpret=interpret)


def _fwd(q, k, v, valid, interpret):
    return _call(q, k, v, valid, interpret=interpret), (q, k, v, valid)


def _bwd(interpret, res, g):
    q, k, v, valid = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, valid), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


short_attention.defvjp(_fwd, _bwd)


def supported(q_shape, dtype) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    bs, L, H, hd = q_shape
    # one (L, L) f32 + 4 rows of (L, hd) per program
    vmem = L * L * 4 + 4 * L * hd * 2 + L * 4
    return L <= _MAX_TOKENS and vmem < 12 * 1024 * 1024 and hd % 64 == 0
