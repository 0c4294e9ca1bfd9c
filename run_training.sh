#!/usr/bin/env bash
# Train FLUID-LLM-TPU (equivalent of the reference run_training.sh).
# A single process drives all local TPU devices via the mesh in the config;
# bf16 comes from half_precision in the YAML.
set -e
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/fluid_llm_tpu_xla}"
if [ "${FLUID_AUTO_RESUME:-0}" = "1" ]; then
  # supervise-and-resume on crash/preemption (tools/watchdog.py)
  exec python -m fluid_llm_tpu.tools.watchdog --config_path "${1:-configs/training1.yaml}"
fi
python -m fluid_llm_tpu.main --config_path "${1:-configs/training1.yaml}"
