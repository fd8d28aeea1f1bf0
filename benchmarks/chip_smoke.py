"""On-chip smoke gate for every default-dispatched pallas kernel.

Round-3 postmortem (VERDICT.md Weak #1/#2): all pallas tests run
interpret=True on CPU, which cannot catch Mosaic LOWERING bugs — the
round-3 snapshot shipped a diag-scheme default that aborted the whole
process (XLA `Check failed: limits[i] <= dim(i)`) the first time it hit a
real chip, zeroing the round's bench.  This gate runs a tiny REAL
execution of each kernel the production dispatch can select, each in a
SUBPROCESS (a Mosaic check failure is a SIGABRT — it cannot be caught
in-process), and reports pass/fail per config.

Run before any snapshot that touches `gpr_tpu/ops/` (see CLAUDE.md):

    python benchmarks/chip_smoke.py            # all probes, ~2 min
    python benchmarks/chip_smoke.py fused      # one group

Exit code 0 iff every probe passed.  Analogue of the reference's
always-run timed test (reference tests/GaussianProcessTest.cpp:123-155).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Each probe is (name, python-source).  Sources must print PROBE_OK on
# success; any crash/abort/nonzero-exit fails the probe.  Keep shapes
# TINY (n=1024 is the smallest the fused path dispatches at) — the point
# is lowering + execution, not performance.
_COMMON = """
import jax, jax.numpy as jnp
import numpy as np
from gpr_tpu.utils import config as _cfg
_cfg.set_matmul_precision("high")
"""

PROBES = {
    # --- fused whole-factorization kernel (default fit path) -------------
    "fused_matrix_strip": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import cholesky_fused
n = 1024
a = jnp.asarray(np.random.default_rng(0).standard_normal((n, 64)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = cholesky_fused(A, diag_scheme="strip")
err = float(jnp.max(jnp.abs(jnp.tril(L @ L.T) - jnp.tril(A))))
assert err < 1e-2 * n, err
print("PROBE_OK")
""",
    "fused_matrix_aug": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import cholesky_fused
n = 1024
a = jnp.asarray(np.random.default_rng(0).standard_normal((n, 64)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = cholesky_fused(A, diag_scheme="aug")
err = float(jnp.max(jnp.abs(jnp.tril(L @ L.T) - jnp.tril(A))))
assert err < 1e-2 * n, err
print("PROBE_OK")
""",
    "fused_gram_strip": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused
n, d = 1024, 8
X = jnp.asarray(np.random.default_rng(1).standard_normal((n, d)), jnp.float32)
L = gram_cholesky_fused(X, 1.0, 1.0, 1.0, 0.1, form="gaussian",
                        diag_scheme="strip")
assert bool(jnp.isfinite(L[-1, -1])), "NaN tail"
print("PROBE_OK")
""",
    "fused_gram_aug": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused
n, d = 1024, 8
X = jnp.asarray(np.random.default_rng(1).standard_normal((n, d)), jnp.float32)
L = gram_cholesky_fused(X, 1.0, 1.0, 1.0, 0.1, form="gaussian",
                        diag_scheme="aug")
assert bool(jnp.isfinite(L[-1, -1])), "NaN tail"
print("PROBE_OK")
""",
    "fused_matrix_stat": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import cholesky_fused
n = 1024
a = jnp.asarray(np.random.default_rng(0).standard_normal((n, 64)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = cholesky_fused(A, diag_scheme="stat")
err = float(jnp.max(jnp.abs(jnp.tril(L @ L.T) - jnp.tril(A))))
assert err < 1e-2 * n, err
print("PROBE_OK")
""",
    "fused_gram_stat": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused
n, d = 1024, 8
X = jnp.asarray(np.random.default_rng(1).standard_normal((n, d)), jnp.float32)
L = gram_cholesky_fused(X, 1.0, 1.0, 1.0, 0.1, form="gaussian",
                        diag_scheme="stat")
assert bool(jnp.isfinite(L[-1, -1])), "NaN tail"
print("PROBE_OK")
""",
    # the round-5 default scheme: fused pivot pairs
    "fused_matrix_stat2": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import cholesky_fused
n = 1024
a = jnp.asarray(np.random.default_rng(0).standard_normal((n, 64)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = cholesky_fused(A, diag_scheme="stat2")
err = float(jnp.max(jnp.abs(jnp.tril(L @ L.T) - jnp.tril(A))))
assert err < 1e-2 * n, err
print("PROBE_OK")
""",
    "fused_gram_stat2": _COMMON + """
from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused
n, d = 1024, 8
X = jnp.asarray(np.random.default_rng(1).standard_normal((n, d)), jnp.float32)
L = gram_cholesky_fused(X, 1.0, 1.0, 1.0, 0.1, form="gaussian",
                        diag_scheme="stat2")
assert bool(jnp.isfinite(L[-1, -1])), "NaN tail"
print("PROBE_OK")
""",
    # the full public fit() route (whatever defaults dispatch selects).
    # GPR_SMOKE_FIT_N overrides n: bench.py probes at the HEADLINE shape
    # (Mosaic lowering failures are shape-dependent — a n=1024 pass does
    # not guard a n=16384 bench; ADVICE round 4)
    "public_fit_default": _COMMON + """
import os
from gpr_tpu.gp import exact
import gpr_tpu
n = int(os.environ.get("GPR_SMOKE_FIT_N", 1024))
d = 8
X = jnp.asarray(np.random.default_rng(2).standard_normal((n, d)), jnp.float32)
y = jnp.asarray(np.random.default_rng(3).standard_normal((n, 2)), jnp.float32)
gp = exact.fit(gpr_tpu.Gaussian(2.0, 1.0), X, y, sigma=0.3,
               use_pallas_gram=True)
assert bool(jnp.all(jnp.isfinite(gp.alpha))), "non-finite alpha"
print("PROBE_OK")
""",
    # NON-ALIGNED n through the public fit: pad-masked fused kernel at
    # panel=256 (the round-5 arbitrary-n path; reference-realistic scales
    # n=2500/3773 dispatch through this specialization class)
    "public_fit_padded": _COMMON + """
import os
from gpr_tpu.gp import exact
import gpr_tpu
n = int(os.environ.get("GPR_SMOKE_PAD_N", 1200))  # 700 covers the
d, q = 6, 2                                        # small-n gate class
rng = np.random.default_rng(9)
X = rng.standard_normal((n, d)).astype(np.float32)
Y = rng.standard_normal((n, q)).astype(np.float32)
gp = exact.fit(gpr_tpu.Gaussian(2.0, 1.0), jnp.asarray(X), jnp.asarray(Y),
               sigma=0.3, use_pallas_gram=True)
assert gp.alpha.shape == (n, q), gp.alpha.shape
assert gp.L.shape == (n, n), gp.L.shape
alpha = np.asarray(gp.alpha).astype(np.float64)
X64 = X.astype(np.float64)
sq = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
K = 1.0 * np.exp(-0.5 * sq / 4.0) + 0.09 * np.eye(n)
ref = np.linalg.solve(K, Y.astype(np.float64))
err = np.abs(alpha - ref).max() / np.abs(ref).max()
assert err < 5e-3, err
print("PROBE_OK")
""",
    # ill-conditioned residual probe for the W-emission solve
    # (cho_solve_panels replaces backward-stable triangular solves with
    # inverse multiplies; verify accuracy does not collapse when
    # cond(K) ~ 1e6: long length-scale + tiny noise)
    "fit_illcond": _COMMON + """
import gpr_tpu
from gpr_tpu.gp import exact
n, d, q = 2048, 4, 2
rng = np.random.default_rng(11)
X = rng.standard_normal((n, d)).astype(np.float32)
Y = rng.standard_normal((n, q)).astype(np.float32)
k = gpr_tpu.Gaussian(jnp.asarray(3.0, jnp.float32), jnp.asarray(1.0, jnp.float32))
gp = exact.fit(k, jnp.asarray(X), jnp.asarray(Y), sigma=1e-2,
               use_pallas_gram=True)
alpha = np.asarray(gp.alpha).astype(np.float64)
X64 = X.astype(np.float64)
sq = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
K = np.exp(-0.5 * sq / 9.0) + 1e-4 * np.eye(n)
cond = np.linalg.cond(K)
assert cond > 1e6, f"probe not ill-conditioned (cond={cond:.2e})"
resid = np.abs(K @ alpha - Y).max() / np.abs(Y).max()
# Calibrated on chip (round 5): at cond 1.4e7 the residual vs the FLOAT64
# Gram is 0.904 on the fused W-emission path and 0.903 on the
# backward-stable twopass path — i.e. it is dominated by the f32 Gram
# representation error, NOT the inverse-multiply solve.  The gate catches
# a solve-scheme collapse (an order-of-magnitude excursion above the
# twopass-equivalent level), not f32 physics.
assert resid < 2.0, (resid, cond)
assert np.isfinite(alpha).all()
print("PROBE_OK")
""",
    # full-fit ACCURACY at a multi-panel scale (nc=8): fused kernel + the
    # W-emission panel solve vs float64 numpy — the scale class the
    # small-n interpret tests cannot cover
    "fit_accuracy_n4096": _COMMON + """
import gpr_tpu
from gpr_tpu.gp import exact
n, d, q = 4096, 16, 4
rng = np.random.default_rng(7)
X = rng.standard_normal((n, d)).astype(np.float32)
Y = rng.standard_normal((n, q)).astype(np.float32)
k = gpr_tpu.Gaussian(jnp.asarray(4.0, jnp.float32), jnp.asarray(1.0, jnp.float32))
gp = exact.fit(k, jnp.asarray(X), jnp.asarray(Y), sigma=0.3, use_pallas_gram=True)
alpha = np.asarray(gp.alpha); L = np.asarray(gp.L)
X64 = X.astype(np.float64)
sq = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
K = np.exp(-0.5 * sq / 16.0) + 0.09 * np.eye(n)
ref = np.linalg.solve(K, Y.astype(np.float64))
a_err = np.abs(alpha - ref).max() / np.abs(ref).max()
l_err = np.abs(L - np.linalg.cholesky(K)).max() / np.abs(L).max()
assert a_err < 5e-3 and l_err < 5e-3, (a_err, l_err)
print("PROBE_OK")
""",
    # --- standalone pallas kernels on the recursive path ------------------
    "gram_pallas": _COMMON + """
from gpr_tpu.ops.pallas_gram import gram_pallas
n, d = 1024, 8
X = jnp.asarray(np.random.default_rng(4).standard_normal((n, d)), jnp.float32)
K = gram_pallas(X, X, 1.0, 1.0, 1.0, 0.1, form="gaussian", tril=True)
assert bool(jnp.isfinite(K[-1, -1]))
print("PROBE_OK")
""",
    "syrk_pallas": _COMMON + """
from gpr_tpu.ops.pallas_syrk import syrk_update
n, k = 1024, 512
rng = np.random.default_rng(5)
Ch = rng.standard_normal((n, n)).astype(np.float32)
Bh = rng.standard_normal((n, k)).astype(np.float32)
out = np.asarray(syrk_update(jnp.asarray(Ch), jnp.asarray(Bh)))
# reference on HOST (an on-chip jnp matmul would itself run the sloppy
# single-pass bf16 default and dominate the error)
ref = Ch.astype(np.float64) - Bh.astype(np.float64) @ Bh.T.astype(np.float64)
err = np.abs(np.tril(out) - np.tril(ref)).max()
assert err < 1e-1, err
print("PROBE_OK")
""",
    "recursive_chol": _COMMON + """
from gpr_tpu.ops.blocked import cholesky_blocked
n = 2048
a = jnp.asarray(np.random.default_rng(6).standard_normal((n, 128)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = cholesky_blocked(A)
err = float(jnp.max(jnp.abs(jnp.tril(L @ L.T) - jnp.tril(A))))
assert err < 1e-2 * n, err
print("PROBE_OK")
""",
    # --- fleet (batched) kernels -----------------------------------------
    "fleet_batched_fit": _COMMON + """
from gpr_tpu.gp.batched import fit_batched
import gpr_tpu
B, n, d, q = 4, 256, 8, 2
rng = np.random.default_rng(7)
X = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
y = jnp.asarray(rng.standard_normal((B, n, q)), jnp.float32)
fleet = fit_batched(gpr_tpu.Gaussian(2.0, 1.0), X, y, 0.3)
assert bool(jnp.all(jnp.isfinite(fleet.alpha)))
print("PROBE_OK")
""",
    # --- narrow solve kernel (flag-gated but shipped) ---------------------
    "solve_narrow": _COMMON + """
from gpr_tpu.ops.pallas_solve import cho_solve_narrow
n, q = 1024, 8
rng = np.random.default_rng(8)
a = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
A = a @ a.T + n * jnp.eye(n, dtype=jnp.float32)
L = jnp.linalg.cholesky(A)
bvec = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
x = cho_solve_narrow(L, bvec)
err = float(jnp.max(jnp.abs(A @ x - bvec)))
assert err < 1e-1, err
print("PROBE_OK")
""",
}

GROUPS = {
    "fused": [k for k in PROBES if k.startswith(("fused", "public", "fit_"))],
    "pallas": ["gram_pallas", "syrk_pallas", "recursive_chol"],
    "fleet": ["fleet_batched_fit"],
    "solve": ["solve_narrow"],
}


def run_probe(name: str, timeout: float = 1200.0, extra_env: dict | None = None):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    if extra_env:
        env.update(extra_env)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", PROBES[name]],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        ok = proc.returncode == 0 and "PROBE_OK" in proc.stdout
        tail = (proc.stdout + proc.stderr)[-2000:]
    except subprocess.TimeoutExpired:
        ok, tail = False, f"TIMEOUT after {timeout}s"
    return {"name": name, "ok": ok, "seconds": round(time.time() - t0, 1),
            "tail": None if ok else tail}


def main(argv):
    if len(argv) > 1:
        names = GROUPS.get(argv[1], [argv[1]] if argv[1] in PROBES else [])
        if not names:
            print(f"unknown probe/group {argv[1]!r}; have {sorted(PROBES)}")
            return 2
    else:
        names = list(PROBES)
    results = []
    for name in names:
        r = run_probe(name)
        results.append(r)
        print(f"[{'PASS' if r['ok'] else 'FAIL'}] {name} ({r['seconds']}s)")
        if not r["ok"]:
            print("  ---- tail ----")
            for line in (r["tail"] or "").splitlines()[-15:]:
                print("  " + line)
    n_fail = sum(not r["ok"] for r in results)
    print(json.dumps({"probes": len(results), "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
