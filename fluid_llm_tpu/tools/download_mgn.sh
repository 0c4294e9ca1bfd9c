#!/usr/bin/env bash
# Download DeepMind MeshGraphNets datasets (equivalent of
# max/ds_download/MGN_download.sh) and convert to per-trajectory pickles.
#
# Usage: download_mgn.sh <dataset> <output_dir>
#   dataset: cylinder_flow | airfoil | deforming_plate | ...
#
# Requires network access; in air-gapped environments place the tfrecords +
# meta.json under <output_dir>/raw manually and run the convert step alone.
set -euo pipefail

DATASET="${1:-cylinder_flow}"
OUT="${2:-./ds/MGN/${DATASET}_dataset}"
BASE="https://storage.googleapis.com/dm-meshgraphnets/${DATASET}"

mkdir -p "${OUT}/raw"
for f in meta.json train.tfrecord valid.tfrecord test.tfrecord; do
  echo "fetching ${BASE}/${f}"
  curl -fL -o "${OUT}/raw/${f}" "${BASE}/${f}"
done

for split in train valid test; do
  python -m fluid_llm_tpu.tools.convert_mgn \
    --dataset_dir "${OUT}/raw" --split "${split}" --out_dir "${OUT}/${split}"
done
echo "done: ${OUT}"
