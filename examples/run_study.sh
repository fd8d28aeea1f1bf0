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

echo "== 1/5 synthetic study -> $ROOT"
python examples/make_synthetic_study.py "$ROOT"

echo "== 2/5 experiments (all configs in examples/params/)"
python -m gpr_tpu.apps.experiments examples/params/

echo "== 3/5 drift window sweep (n_train=20, windows 0/8/16)"
python -m gpr_tpu.apps.drift examples/params/respiratory_drift.yaml 20 0,8,16

echo "== 4/5 pmb/tracking config matrix (examples/params/matrix/)"
python - <<'EOF'
# per-config studies (the matrix mirrors the reference's per-patient
# param packs: each config owns its root_dir), then one dir-mode sweep
import os, sys, yaml
sys.path.insert(0, "examples")
from make_synthetic_study import make_ar_study, make_study

src = "examples/params/matrix"
run_dir = "/tmp/gpr_tpu_matrix/configs"
os.makedirs(run_dir, exist_ok=True)
for name in sorted(f for f in os.listdir(src) if f.endswith(".yaml")):
    with open(os.path.join(src, name)) as f:
        cfg = yaml.safe_load(f)
    root = cfg["general"]["root_dir"]
    if "_ar" in name:
        make_ar_study(root)
    else:
        make_study(root, 50, field_ncomp=2 if "tracking" in name else 3)
    with open(os.path.join(run_dir, name), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
EOF
python -m gpr_tpu.apps.experiments /tmp/gpr_tpu_matrix/configs
python -m gpr_tpu.apps.drift /tmp/gpr_tpu_matrix/configs/config_pmb_vol05_drift.yaml 20 0,8

echo "== 5/5 vtk -> mha conversion of predictions"
python - "$ROOT" <<'EOF'
import sys
from gpr_tpu.apps.analysis import convert_vtk_dir
src = f"{sys.argv[1]}/reg3d/test_pred"
n = convert_vtk_dir(src, src + "_mha")
print(f"converted {n} volumes -> {src}_mha")
EOF

echo "study complete: $ROOT"
