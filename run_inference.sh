#!/usr/bin/env bash
# Rollout evaluation (equivalent of the reference run_inference.sh):
# 1 context state, 251 predicted steps, N-RMSE report.
set -e
python -m fluid_llm_tpu.inference "$@"
