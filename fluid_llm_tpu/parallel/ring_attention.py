"""Ring attention — context parallelism for the token axis.

The reference has no sequence/context parallelism at all (SURVEY.md §2.4:
sequences are 541–661 tokens).  This module is the scaling path for when
grid resolution grows the token axis past one chip's HBM: queries stay
resident on their shard while K/V blocks rotate around the mesh axis via
``ppermute`` (one nearest-neighbour ICI hop per step), accumulating the
exact softmax online — flash-attention's (m, l, acc) recurrence at the
shard level.  Per-device attention memory is O((L/n)²) per hop instead of
O(L²), and the K/V transfer of hop h overlaps the matmuls of hop h-1 (XLA
schedules the collective-permute async on TPU).

Exactness: identical to dense causal attention under the backbone's mask
semantics (``backbone.make_masks``: key-valid AND index-causal, diagonal
forced on) — pinned by ``tests/test_ring.py`` against
``backbone._attention_xla`` for forward AND gradients.

Composable with the existing mesh axes: tokens shard over ``"model"``
(Megatron-CP convention — reuses the axis ``seq_sharded_acts`` already
shards activations over between blocks); batch stays on (data, fsdp).
Enable with ``parallel.ring_attention: true`` (requires
``seq_sharded_acts`` so the surrounding blocks keep tokens sharded; the
ring then replaces the all-gather GSPMD would otherwise insert for
attention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def ring_attention(q, k, v, valid, mesh: Mesh, axis: str = "model"):
    """Exact causal attention with tokens sharded over ``axis``.

    q/k/v: (bs, L, H, hd) — GQA already expanded (H = n_heads);
    valid:  (bs, L) bool (front-invalid window slots, as the rollout uses).
    L must divide evenly over ``mesh.shape[axis]`` (the framework pads
    windows to static shapes upstream, so this holds by construction).
    Returns (bs, L, H, hd) in q's dtype, token-sharded like the inputs.
    """
    n = mesh.shape[axis]
    bs, L, H, hd = q.shape
    if L % n != 0:
        raise ValueError(f"token count {L} not divisible by {axis}={n}")
    # batch sharding follows parallel/mesh.py::batch_sharding — including
    # the "expert" axis when present (DP+EP meshes shard batch over it too)
    batch = tuple(
        a for a in ("data", "fsdp", "expert") if a in mesh.axis_names
    )
    bspec = batch if batch else None
    spec4 = P(bspec, axis, None, None)
    spec2 = P(bspec, axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
    )
    def _ring(q_l, k_l, v_l, val_l):
        me = jax.lax.axis_index(axis)
        bs_l, Lq, _, _ = q_l.shape
        Lk = k_l.shape[1]
        scale = hd ** -0.5
        g_q = me * Lq + jnp.arange(Lq)  # global token indices of my queries
        qf = q_l.astype(jnp.float32)

        m = jnp.full((bs_l, H, Lq), -jnp.inf, jnp.float32)
        l = jnp.zeros((bs_l, H, Lq), jnp.float32)
        acc = jnp.zeros((bs_l, H, Lq, hd), jnp.float32)
        kc, vc, valc = k_l, v_l, val_l
        src = me  # which shard's K/V block is currently resident
        perm = [(i, (i + 1) % n) for i in range(n)]

        for _ in range(n):
            g_k = src * Lk + jnp.arange(Lk)
            # backbone.make_masks semantics: (index-causal AND key-valid)
            # OR diagonal (invalid-query rows keep one finite logit; their
            # outputs are never read)
            allowed = (
                (g_q[:, None] >= g_k[None, :]) & valc[:, None, :]
            ) | (g_q[:, None] == g_k[None, :])
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", qf, kc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(allowed[:, None], s, -jnp.inf)

            m_new = jnp.maximum(m, s.max(axis=-1))
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(s - m_safe[..., None])  # masked entries: exp(-inf)=0
            coef = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
            l = l * coef + p.sum(axis=-1)
            acc = acc * coef[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, vc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            m = m_new
            if n > 1:
                kc = jax.lax.ppermute(kc, axis, perm)
                vc = jax.lax.ppermute(vc, axis, perm)
                valc = jax.lax.ppermute(valc, axis, perm)
                src = (src - 1) % n

        out = acc / jnp.maximum(l, 1e-37)[..., None]
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q_l.dtype)

    return _ring(q, k, v, valid)
