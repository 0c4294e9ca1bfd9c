"""Pallas TPU flash attention (block-wise online softmax on the MXU).

TPU-native replacement for the flash-attn-2 CUDA kernel the reference enables
via ``attn_implementation="flash_attention_2"`` (``src/models/model.py:54``,
flag ``configs/training1.yaml:16``).

Masking contract matches ``backbone.make_masks``: causal AND key-valid, with
the diagonal always allowed so fully-masked query rows (the rollout window's
unused tail) stay finite.

Forward streams K/V block-by-block: grid (batch*heads, q-blocks, k-blocks)
with running (max, sum, acc) state in VMEM scratch — per-program residency is
O(block), not O(L), and logits never materialise in HBM.  The forward also
emits the per-row logsumexp so the backward can recompute probabilities
in-kernel.

Backward is two Pallas kernels (flash-attention-2 style):
  * dq: grid (bh, q-blocks, k-blocks) — recompute p from (q, k, lse),
    ds = p * (dO.v - delta), accumulate dq += ds.k in scratch;
  * dk/dv: grid (bh, k-blocks, q-blocks) — same recompute transposed,
    dv += p^T.dO and dk += ds^T.q accumulated in scratch.
delta = rowsum(dO * O) is a cheap XLA contraction outside the kernels.
All memory is O(L*block) — no O(L^2) logits in either direction.

Causal skip without a triangular grid: the k-block index map clamps to the
causal frontier (``min(ki, qi)``), so out-of-frontier grid steps re-fetch the
previous block (no new DMA) and ``pl.when`` skips their compute.
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
_LANES = 128  # row-stat scratch is lane-replicated (TPU tiling wants 128)


def _mask(rows, cols, kv):
    # causal AND key-valid, diagonal always allowed (see module docstring)
    return (cols <= rows) & (kv[None, :] | (cols == rows))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, num_k: int):
    qi, ki = pl.program_id(1), pl.program_id(2)
    bq, hd = q_ref.shape[1], q_ref.shape[2]
    blk_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(ki <= qi)
    def _step():
        q = q_ref[0].astype(jnp.float32) * scale  # (BQ, hd)
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        kv = valid_ref[0, 0] != 0  # (BK,)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 0)
        cols = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 1)
        allowed = _mask(rows, cols, kv)
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None]) * allowed.astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
        acc_scr[...] = acc_scr[...] * alpha[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new[:, None], l_scr.shape)

    @pl.when(ki == num_k - 1)
    def _out():
        l = l_scr[:, 0]
        o_ref[0] = (acc_scr[...] / l[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, 0] + jnp.log(l)


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


def _pad_all(q, k, v, valid):
    bs, L, H, hd = q.shape
    blk = max(BLOCK_Q, BLOCK_K)
    Lp = -(-L // blk) * blk
    pad = Lp - L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return q, k, v, valid, Lp


def _to_bh(x, bs, H, Lp, hd):
    return x.transpose(0, 2, 1, 3).reshape(bs * H, Lp, hd)


def _flash_forward_lse(q, k, v, valid, *, interpret=False):
    """Returns (out (bs,L,H,hd), lse (bs*H, 1, Lp) f32)."""
    bs, L, H, hd = q.shape
    q, k, v, valid, Lp = _pad_all(q, k, v, valid)
    qb, kb, vb = (_to_bh(x, bs, H, Lp, hd) for x in (q, k, v))
    # singleton middle axis so blocks tile as (1, 1, BLOCK): TPU requires the
    # last two block dims to divide (8, 128) or equal the array dims
    valid_i = valid.astype(jnp.int32)[:, None, :]

    nq, nk = Lp // BLOCK_Q, Lp // BLOCK_K
    kmap = lambda bh, qi, ki: (bh // H, 0, jnp.minimum(ki, qi))

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=hd**-0.5, num_k=nk),
        grid=(bs * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK_K), kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, hd),
                         lambda bh, qi, ki: (bh, jnp.minimum(ki, qi), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, hd),
                         lambda bh, qi, ki: (bh, jnp.minimum(ki, qi), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, hd), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_Q), lambda bh, qi, ki: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bs * H, Lp, hd), q.dtype),
            jax.ShapeDtypeStruct((bs * H, 1, Lp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, _LANES), jnp.float32),
            pltpu.VMEM((BLOCK_Q, _LANES), jnp.float32),
            pltpu.VMEM((BLOCK_Q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(valid_i, qb, kb, vb)

    out = out.reshape(bs, H, Lp, hd).transpose(0, 2, 1, 3)
    return out[:, :L], lse


def _flash_forward(q, k, v, valid, *, interpret=False):
    return _flash_forward_lse(q, k, v, valid, interpret=interpret)[0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale: float, num_k: int):
    qi, ki = pl.program_id(1), pl.program_id(2)
    bq, hd = q_ref.shape[1], q_ref.shape[2]
    blk_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(ki <= qi)
    def _step():
        q = q_ref[0].astype(jnp.float32)
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0]  # (BQ,)
        delta = delta_ref[0, 0]
        kv = valid_ref[0, 0] != 0

        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 0)
        cols = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 1)
        allowed = _mask(rows, cols, kv)
        p = jnp.where(allowed, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        dq_scr[...] = dq_scr[...] + scale * jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_k - 1)
    def _out():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, num_q: int):
    ki, qi = pl.program_id(1), pl.program_id(2)
    bq, hd = q_ref.shape[1], q_ref.shape[2]
    blk_k = k_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(qi >= ki)
    def _step():
        q = q_ref[0].astype(jnp.float32)
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        kv = valid_ref[0, 0] != 0

        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 0)
        cols = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (bq, blk_k), 1)
        allowed = _mask(rows, cols, kv)
        p = jnp.where(allowed, jnp.exp(s - lse[:, None]), 0.0)
        dv_scr[...] = dv_scr[...] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, hd)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        dk_scr[...] = dk_scr[...] + scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == num_q - 1)
    def _out():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, valid, out, lse, g, *, interpret=False):
    bs, L, H, hd = q.shape
    # delta = rowsum(dO * O): one cheap fused elementwise+reduce in XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (bs,L,H)

    q, k, v, valid, Lp = _pad_all(q, k, v, valid)
    g = jnp.pad(g, ((0, 0), (0, Lp - L), (0, 0), (0, 0))) if Lp != L else g
    delta = jnp.pad(delta, ((0, 0), (0, Lp - L), (0, 0))) if Lp != L else delta
    qb, kb, vb, gb = (_to_bh(x, bs, H, Lp, hd) for x in (q, k, v, g))
    delta_b = delta.transpose(0, 2, 1).reshape(bs * H, 1, Lp)
    valid_i = valid.astype(jnp.int32)[:, None, :]

    nq, nk = Lp // BLOCK_Q, Lp // BLOCK_K
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
    )

    # --- dq: stream k-blocks up to the causal frontier --------------------
    kfrontier = lambda bh, qi, ki: (bh, jnp.minimum(ki, qi), 0)
    rowspec = lambda: pl.BlockSpec((1, BLOCK_Q, hd), lambda bh, qi, ki: (bh, qi, 0),
                                   memory_space=pltpu.VMEM)
    rowstat = lambda: pl.BlockSpec((1, 1, BLOCK_Q), lambda bh, qi, ki: (bh, 0, qi),
                                   memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=hd**-0.5, num_k=nk),
        grid=(bs * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK_K),
                         lambda bh, qi, ki: (bh // H, 0, jnp.minimum(ki, qi)),
                         memory_space=pltpu.VMEM),
            rowspec(),
            pl.BlockSpec((1, BLOCK_K, hd), kfrontier, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, hd), kfrontier, memory_space=pltpu.VMEM),
            rowspec(),
            rowstat(),
            rowstat(),
        ],
        out_specs=rowspec(),
        out_shape=jax.ShapeDtypeStruct((bs * H, Lp, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((BLOCK_Q, hd), jnp.float32)],
        compiler_params=cp,
        interpret=interpret,
    )(valid_i, qb, kb, vb, gb, lse, delta_b)

    # --- dk/dv: stream q-blocks from the causal frontier ------------------
    qfrontier = lambda bh, ki, qi: (bh, jnp.maximum(qi, ki), 0)
    qstat = lambda: pl.BlockSpec((1, 1, BLOCK_Q),
                                 lambda bh, ki, qi: (bh, 0, jnp.maximum(qi, ki)),
                                 memory_space=pltpu.VMEM)
    colspec = lambda: pl.BlockSpec((1, BLOCK_K, hd), lambda bh, ki, qi: (bh, ki, 0),
                                   memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=hd**-0.5, num_q=nq),
        grid=(bs * H, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK_K), lambda bh, ki, qi: (bh // H, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, hd), qfrontier, memory_space=pltpu.VMEM),
            colspec(),
            colspec(),
            pl.BlockSpec((1, BLOCK_Q, hd), qfrontier, memory_space=pltpu.VMEM),
            qstat(),
            qstat(),
        ],
        out_specs=(colspec(), colspec()),
        out_shape=(
            jax.ShapeDtypeStruct((bs * H, Lp, hd), q.dtype),
            jax.ShapeDtypeStruct((bs * H, Lp, hd), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_K, hd), jnp.float32),
            pltpu.VMEM((BLOCK_K, hd), jnp.float32),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(valid_i, qb, kb, vb, gb, lse, delta_b)

    def from_bh(x):
        return x.reshape(bs, H, Lp, hd).transpose(0, 2, 1, 3)[:, :L]

    return from_bh(dq), from_bh(dk), from_bh(dv)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, valid, interpret: bool = False):
    """q/k/v: (bs, L, H, hd); valid: (bs, L) bool -> (bs, L, H, hd)."""
    return _flash_forward(q, k, v, valid, interpret=interpret)


def _fwd(q, k, v, valid, interpret):
    out, lse = _flash_forward_lse(q, k, v, valid, interpret=interpret)
    return out, (q, k, v, valid, out, lse)


def _bwd(interpret, res, g):
    q, k, v, valid, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, valid, out, lse, g, interpret=interpret)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
