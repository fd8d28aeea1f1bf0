#!/usr/bin/env bash
# Run the whole respiratory-motion study end to end — the rebuild's
# single documented entry point (analogue of the reference's
# scripts/start_gpr.sh + scripts/README.md study recipes).
#
#   examples/run_study.sh [root_dir]
#
# Stages: synthetic study generation (data/, us/, reg3d/), every config in
# examples/params/ (full pipeline incl. DICOM preprocessing, base
# regression+evaluation, drift base), then the drift window sweep and the
# VTK->MHA conversion of the predictions.
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="${1:-/tmp/gpr_tpu_study}"

echo "== 1/4 synthetic study -> $ROOT"
python examples/make_synthetic_study.py "$ROOT"

echo "== 2/4 experiments (all configs in examples/params/)"
python -m gpr_tpu.apps.experiments examples/params/

echo "== 3/4 drift window sweep (n_train=20, windows 0/8/16)"
python -m gpr_tpu.apps.drift examples/params/respiratory_drift.yaml 20 0,8,16

echo "== 4/4 vtk -> mha conversion of predictions"
python - "$ROOT" <<'EOF'
import sys
from gpr_tpu.apps.analysis import convert_vtk_dir
src = f"{sys.argv[1]}/reg3d/test_pred"
n = convert_vtk_dir(src, src + "_mha")
print(f"converted {n} volumes -> {src}_mha")
EOF

echo "study complete: $ROOT"
