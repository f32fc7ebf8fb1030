#!/bin/sh
# Run an experiment grid under the native executor (resumable; see
# csrc/gridrunner.cpp).  Argument: a declarative YAML/JSON spec
# (examples/gridspec.py schema) or a plain command file; default is the
# canonical grid spec.
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
SPEC="${1:-examples/grids/canonical.yaml}"
case "$SPEC" in
  *.yaml|*.yml|*.json)
    CMDS=$(mktemp /tmp/alan_grid_cmds.XXXXXX)
    python examples/gridspec.py "$SPEC" -o "$CMDS" || exit 1
    ;;
  *)
    CMDS="$SPEC"
    ;;
esac
exec alan_tpu/_native/alan-grid -j "${JOBS:-2}" -t "${TIMEOUT:-7200}" -s results/job_status.tsv "$CMDS"
