#!/bin/sh
# Run the canonical grid under the native executor (resumable; see csrc/gridrunner.cpp)
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
exec alan_tpu/_native/alan-grid -j "${JOBS:-2}" -t "${TIMEOUT:-7200}" -s results/job_status.tsv examples/grids/all_models.txt
