"""Micro-benchmark: Pallas flash attention vs XLA attention on the chip.

Times forward and forward+backward at the reference head geometry
(12 heads x 64 head_dim, bf16) across sequence lengths, to keep the
dispatch crossover in ``backbone._sdpa`` honest.

Usage: python -m fluid_llm_tpu.tools.flash_bench [bs] [lengths...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fluid_llm_tpu.ops.flash_attention import _reference_attention, flash_attention

    args = [int(a) for a in sys.argv[1:]]
    bs = args[0] if args else 1
    lengths = args[1:] or [661, 1536, 4096, 8192]
    H, hd = 12, 64
    rng = np.random.default_rng(0)

    def timeit(fn, *xs, reps=10):
        out = fn(*xs)
        jax.tree_util.tree_map(lambda t: float(jnp.asarray(t).astype(jnp.float32).mean()), out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*xs)
        jax.tree_util.tree_map(lambda t: float(jnp.asarray(t).astype(jnp.float32).mean()), out)
        return (time.time() - t0) / reps * 1e3

    print(f"bs={bs} H={H} hd={hd} bf16; times in ms")
    print(f"{'L':>6} {'xla fwd':>9} {'flash fwd':>9} {'xla f+b':>9} {'flash f+b':>9}")
    for L in lengths:
        q, k, v = (
            jnp.asarray(rng.normal(size=(bs, L, H, hd)).astype(np.float32), jnp.bfloat16)
            for _ in range(3)
        )
        valid = jnp.asarray(np.arange(L)[None, :].repeat(bs, 0) < L - 13)

        f_x = jax.jit(lambda q, k, v: _reference_attention(q, k, v, valid))
        f_p = jax.jit(lambda q, k, v: flash_attention(q, k, v, valid))
        g_x = jax.jit(jax.grad(lambda q, k, v: f_x(q, k, v).astype(jnp.float32).sum(),
                               argnums=(0, 1, 2)))
        g_p = jax.jit(jax.grad(lambda q, k, v: flash_attention(q, k, v, valid)
                               .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        row = [timeit(f, q, k, v) for f in (f_x, f_p, g_x, g_p)]
        print(f"{L:>6} " + " ".join(f"{t:9.2f}" for t in row))


if __name__ == "__main__":
    main()
