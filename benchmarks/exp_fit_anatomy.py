"""Per-piece anatomy of the one-dispatch fused fit (on-chip).

Times, via the chained-R slope (see bench.py::_time_scalar_fn):

  fit        the PUBLIC exact.fit (fused gram+chol dispatch + cho_solve)
  fused      gram_cholesky_fused alone (the single pallas dispatch)
  -gram      ablate="gram"  : panel strips filled with a constant SPD
             pattern instead of the kernel-function tiles
  -dots      ablate="dots"  : update-loop bf16x3 GEMMs skipped (DMAs kept)
  -diag      ablate="diag"  : diagonal factor + inverse skipped
  -solve     ablate="solve" : panel-solve GEMMs skipped
  chosolve   linalg.cho_solve(L, Y) alone (q=8)

The differences full - ablated are each piece's cost INCLUDING whatever
overlap it was hiding, so they over-count; the residual (full - sum of
deltas) is the genuinely overlapped/sequencing cost.

    BENCH_N=16384 python benchmarks/exp_fit_anatomy.py [variants...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    import jax.numpy as jnp
    import numpy as np

    from gpr_tpu.gp import exact
    from gpr_tpu.kernels import kernels as kermod
    from gpr_tpu.ops import linalg
    from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused

    n = int(os.environ.get("BENCH_N", 16384))
    d, q = 128, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
    kernel = kermod.Gaussian(jnp.asarray(8.0), jnp.asarray(1.0))
    interp = jax.default_backend() != "tpu"

    def slope(make_fn, *args, repeats=3, iters=3):
        f1, fR = make_fn(1), make_fn(repeats)
        t0 = time.perf_counter()
        float(f1(*args))
        print(f"  compile r=1 {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        t0 = time.perf_counter()
        float(fR(*args))
        print(f"  compile r={repeats} {time.perf_counter()-t0:.0f}s", file=sys.stderr)

        def best(f):
            b = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                float(f(*args))
                b = min(b, time.perf_counter() - t0)
            return b

        return max((best(fR) - best(f1)) / (repeats - 1), 1e-9)

    def make_fit(r):
        @jax.jit
        def f(X, Y):
            out = jnp.asarray(0.0, jnp.float32)
            for _ in range(r):
                gp = exact.fit(kernel, X + out * 1e-30, Y, sigma=0.1,
                               use_pallas_gram=True)
                out = jnp.sum(gp.L[-1]) + jnp.sum(gp.alpha[-1])
            return out

        return f

    def make_fused(ablate):
        def mk(r):
            @jax.jit
            def f(X):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = gram_cholesky_fused(
                        X + out * 1e-30, 8.0, 1.0, 1.0, 0.01,
                        form="gaussian", interpret=interp, ablate=ablate,
                    )
                    out = jnp.sum(L[-1])
                return out

            return f

        return mk

    # hoisted: slope() calls make_chosolve twice — recomputing the fused
    # factorization per call cost two extra ~1 min remote compiles
    # (ADVICE.md round 3).  Computed lazily so other variants skip it.
    _L0_cache = []

    def _L0():
        if not _L0_cache:
            _L0_cache.append(gram_cholesky_fused(
                X, 8.0, 1.0, 1.0, 0.01, form="gaussian", interpret=interp))
        return _L0_cache[0]

    def make_chosolve(r):
        L0 = _L0()

        @jax.jit
        def f(L, Y):
            out = jnp.asarray(0.0, jnp.float32)
            for _ in range(r):
                a = linalg.cho_solve(L + out * 1e-30, Y)
                out = jnp.sum(a[-1])
            return out

        return lambda *a: f(L0, Y)

    variants = {
        "fit": (make_fit, (X, Y)),
        "fused": (make_fused(""), (X,)),
        "-gram": (make_fused("gram"), (X,)),
        "-dots": (make_fused("dots"), (X,)),
        "-diag": (make_fused("diag"), (X,)),
        "-solve": (make_fused("solve"), (X,)),
        "-stream": (make_fused("stream"), (X,)),
        "chosolve": (make_chosolve, ()),
    }
    names = sys.argv[1:] or list(variants)
    res = {}
    for name in names:
        mk, args = variants[name]
        print(f"{name}:", file=sys.stderr)
        ms = round(slope(mk, *args) * 1e3, 2)
        res[name] = ms
        print(json.dumps({"variant": name, "ms": ms}))
    if "fused" in res:
        deltas = {
            k: round(res["fused"] - res[k], 2)
            for k in ("-gram", "-dots", "-diag", "-solve")
            if k in res
        }
        print(json.dumps({"n": n, "ms": res, "piece_deltas": deltas}))


if __name__ == "__main__":
    main()
