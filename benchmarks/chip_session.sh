#!/bin/bash
# On-chip measurement queue for when the axon tunnel is up.  Run ONE at a
# time (the tunnel contends); each step prints a JSON line or a timing.
# Usage: bash benchmarks/chip_session.sh [step]
set -e
cd "$(dirname "$0")/.."
step=${1:-all}

probe() {
  timeout 60 python -c "import jax; d = jax.devices(); print(d); assert 'cpu' not in str(d[0]).lower()"
}

case "$step" in
  probe) probe ;;
  smoke|all)
    # 1. Mosaic-lowering smoke of the new fleet kernels at tiny size
    timeout 600 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from gpr_tpu.ops import pallas_batched as pb
rng = np.random.default_rng(0)
G = rng.standard_normal((4, 256, 256))
A = jnp.asarray(G @ np.swapaxes(G, 1, 2) + 256 * np.eye(256), jnp.float32)
Y = jnp.asarray(rng.standard_normal((4, 256, 4)), jnp.float32)
L, W = pb.crout_chol_wi(A[:, :128, :128])
print("crout_chol_wi lowered; err:",
      float(jnp.abs(L - jnp.linalg.cholesky(A[:, :128, :128])).max()))
Lf, Xf = pb.factor_solve_fused(A, Y)
ref = np.linalg.solve(np.asarray(A, np.float64), np.asarray(Y, np.float64))
print("factor_solve_fused lowered; X rel:",
      float(np.linalg.norm(np.asarray(Xf) - ref) / np.linalg.norm(ref)))
EOF
    [ "$step" = smoke ] && exit 0 ;;&
  fleet|all)
    # 2. fleet A/B: XLA potrf vs crout (fused) vs panel-stepped vs panel=64
    BENCH_CROUT=0 timeout 900 python benchmarks/bench_batched.py 128 512
    BENCH_CROUT=1 timeout 900 python benchmarks/bench_batched.py 128 512
    BENCH_CROUT=1 GPR_FLEET_PANEL=64 timeout 900 python benchmarks/bench_batched.py 128 512
    BENCH_CROUT=1 GPR_FLEET_FUSED_MAX_N=0 timeout 900 python benchmarks/bench_batched.py 128 512
    [ "$step" = fleet ] && exit 0 ;;&
  headline|all)
    # 3. headline fit() after the round-2 block-tree/tril-gram work
    timeout 1200 python bench.py
    [ "$step" = headline ] && exit 0 ;;&
  inplace|all)
    # 4. in-place wide-panel Cholesky vs recursive (first at 8k, then 16k)
    timeout 1800 python benchmarks/exp_inplace.py 8192
    timeout 1800 python benchmarks/exp_inplace.py 16384
    [ "$step" = inplace ] && exit 0 ;;&
  solve|all)
    # 5. narrow-rhs streaming cho_solve vs blocked solve at n=16k q=8
    timeout 1800 python benchmarks/exp_solve.py
    [ "$step" = solve ] && exit 0 ;;&
  fit_ab|all)
    # 6. headline fit() under the winning schedule flags (flip defaults
    #    in code after recording; these are the A/B probes).  exp_solve
    #    (step 5) decides GPR_SOLVE_DIAGINV=xla|pallas; re-probe the
    #    winning combination here with the diag-inv winner too.
    GPR_SOLVE_SCHEDULE=narrow timeout 1200 python bench.py
    GPR_SOLVE_SCHEDULE=narrow GPR_SOLVE_DIAGINV=pallas timeout 1200 python bench.py
    GPR_CHOL_SCHEDULE=inplace GPR_SOLVE_SCHEDULE=narrow timeout 1200 python bench.py ;;
esac
