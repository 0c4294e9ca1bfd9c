#!/usr/bin/env bash
# Rollout evaluation (equivalent of the reference run_inference.sh):
# 1 context state, 251 predicted steps, N-RMSE report.
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/fluid_llm_tpu_xla}"
python -m fluid_llm_tpu.inference "$@"
