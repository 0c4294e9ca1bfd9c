"""Pallas TPU flash attention (block-wise online softmax on the MXU).

TPU-native replacement for the flash-attn-2 CUDA kernel the reference enables
via ``attn_implementation="flash_attention_2"`` (``src/models/model.py:54``,
flag ``configs/training1.yaml:16``).

Masking contract matches ``backbone.make_masks``: causal AND key-valid, with
the diagonal always allowed so fully-masked query rows (the rollout window's
unused tail) stay finite.

Forward runs as a Pallas kernel: grid over (batch*heads, q-blocks), K/V
resident in VMEM, ``lax.fori_loop`` over k-blocks up to the causal frontier
with running (max, sum, acc) state — logits never materialise in HBM.
Backward recomputes through the XLA reference path via ``jax.custom_vjp``
(exact same math; training sequences here are <=661 tokens so the XLA
backward is not the bottleneck — the kernel's win is the serving/rollout
forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, blk_k: int):
    qi = pl.program_id(1)
    bq, hd = q_ref.shape[1], q_ref.shape[2]

    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, hd)
    rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        kv = valid_ref[0, 0, pl.ds(kb * blk_k, blk_k)] != 0  # (BK,)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        cols = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 1)
        allowed = (cols <= rows) & (kv[None, :] | (cols == rows))
        s = jnp.where(allowed, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None]) * allowed.astype(jnp.float32)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, hd), jnp.float32)
    # causal frontier: only k-blocks up to and including the q-block
    m, l, acc = jax.lax.fori_loop(0, qi + 1, body, (m0, l0, acc0))

    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _reference_attention(q, k, v, valid):
    """XLA path with the identical mask (mirror of backbone._attention_xla)."""
    bs, L = valid.shape
    scale = q.shape[-1] ** -0.5
    causal = jnp.tril(jnp.ones((L, L), bool))
    allowed = causal[None] & valid[:, None, :]
    allowed = allowed | jnp.eye(L, dtype=bool)[None]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(allowed[:, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_forward(q, k, v, valid, *, interpret=False):
    bs, L, H, hd = q.shape
    blk_q = BLOCK_Q
    blk_k = BLOCK_K
    Lp = -(-L // max(blk_q, blk_k)) * max(blk_q, blk_k)

    pad = Lp - L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    # (bs, L, H, hd) -> (bs*H, L, hd)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(bs * H, Lp, hd)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    valid_i = valid.astype(jnp.int32)[:, None, :]  # (bs, 1, Lp) for tiling

    grid = (bs * H, Lp // blk_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=hd**-0.5, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lp), lambda bh, qi: (bh // H, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, hd), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, hd), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, hd), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, hd), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs * H, Lp, hd), q.dtype),
        interpret=interpret,
    )(valid_i, qb, kb, vb)

    out = out.reshape(bs, H, Lp, hd).transpose(0, 2, 1, 3)
    return out[:, :L]


@jax.custom_vjp
def flash_attention(q, k, v, valid):
    """q/k/v: (bs, L, H, hd); valid: (bs, L) bool -> (bs, L, H, hd)."""
    return _flash_forward(q, k, v, valid)


def _fwd(q, k, v, valid):
    return _flash_forward(q, k, v, valid), (q, k, v, valid)


def _bwd(res, g):
    q, k, v, valid = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_, valid), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
