"""FLUID-LLM-TPU: a TPU-native JAX/Pallas rebuild of FLUID-LLM.

FLUID-LLM (arXiv 2406.04501) is a CFD surrogate: irregular triangular CFD
meshes are resampled onto a uniform pixel grid, cut into 16x16 spatiotemporal
patches, embedded, run through a decoder-only LLM backbone with spatiotemporal
positional encodings, and decoded back into per-pixel velocity/pressure diffs
which are integrated autoregressively into a flow rollout.

This package is a from-scratch TPU-first implementation:

- ``core``     mesh->grid resampling as data (precomputed gather indices +
               barycentric plane coefficients; on-device gather/FMA resample).
- ``ops``      patch<->image algebra (pure reshape/transpose), Pallas flash
               attention, static grid-graph GATv2, segment ops for baselines.
- ``models``   functional transformer backbone (GPT-2 / OPT / LLaMA layouts),
               patch encoder/decoders, LoRA/DoRA, the FluidLLM model.
- ``train``    losses, N-RMSE metric, optax trainer with the three step modes,
               Orbax checkpointing.
- ``rollout``  autoregressive generation as ``lax.scan`` with a fixed-size
               sliding window buffer.
- ``parallel`` device mesh + sharding rules (dp / fsdp / tp).
- ``data``     cylinder / airfoil / EAGLE datasets plus a synthetic CFD
               generator used by tests and benchmarks.
- ``tools``    offline converters, dataset stats, constrained k-means.

Reference behaviour citations use ``file:line`` relative to the upstream
FLUID-LLM repo snapshot.
"""

__version__ = "0.1.0"
