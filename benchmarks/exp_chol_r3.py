"""Round-3 factorization schedule A/B (one process, env knobs per variant).

Times the bare blocked Cholesky at n=16k f32 under combinations of:
  * GPR_CHOL_ASSEMBLE   concat (r2 default) vs dus (flat block writes)
  * GPR_CHOL_RIGHT_SOLVE left-side solve(L, A21.T).T (r2 default, pays a
                         dual-layout slice copy per level) vs right-side
  * GPR_CHOL_LEAF / GPR_CHOL_LEAF_INV  XLA 1024-leaves (r2 default) vs
                         pallas leaf factor(+inverse) at 256/512 with all
                         leaf solves as plain GEMMs (no custom-calls)

Trace anatomy motivating the grid (BENCHMARKS.md round 3): of the 45.7 ms
fit, ~19 ms is non-math — 5.5 ms custom-calls + 3.7 ms DUS from XLA's
leaf-cholesky/trisolve expansions, 2.2 ms dual-layout slice copies from
the left-side solves, 1.4 ms assembly masks/selects.

    python benchmarks/exp_chol_r3.py base dus rt rtdus inv256 inv512
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (leaf, leaf_inv, right_solve, assemble, extra_env)
    "base":    ("1024", "0", "0", "concat", {}),
    "dus":     ("1024", "0", "0", "dus", {}),
    "rt":      ("1024", "0", "1", "concat", {}),
    "rtdus":   ("1024", "0", "1", "dus", {}),
    "inv256":  ("256",  "1", "1", "dus", {}),
    "inv512":  ("512",  "1", "1", "dus", {}),
    "inv1024": ("1024", "1", "1", "dus", {}),
    "rt256":   ("256",  "0", "1", "dus", {}),
    "leaf512": ("512",  "0", "0", "concat", {}),
    "syrk_k1024": ("1024", "0", "0", "concat", {"GPR_SYRK_BK": "1024"}),
    "syrk_m1024": ("1024", "0", "0", "concat", {"GPR_SYRK_BM": "1024"}),
    "flat":    ("1024", "0", "0", "concat", {"GPR_CHOL_FLAT_SOLVE": "1"}),
}


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

    names = sys.argv[1:] or ["base", "dus", "rtdus", "inv256", "inv512"]
    n = int(os.environ.get("BENCH_N", 16384))
    rng = np.random.default_rng(0)
    Xm = rng.standard_normal((n, 256)).astype(np.float32)
    A = jnp.asarray(Xm) @ jnp.asarray(Xm.T) * (1.0 / 256) + 4.0 * jnp.eye(
        n, dtype=jnp.float32
    )

    results = {}
    checks = {}
    for name in names:
        leaf, inv, rt, asm, extra = VARIANTS[name]
        for k in ("GPR_SYRK_BM", "GPR_SYRK_BK", "GPR_CHOL_FLAT_SOLVE"):
            os.environ.pop(k, None)
        os.environ["GPR_CHOL_LEAF"] = leaf
        os.environ["GPR_CHOL_LEAF_INV"] = inv
        os.environ["GPR_CHOL_RIGHT_SOLVE"] = rt
        os.environ["GPR_CHOL_ASSEMBLE"] = asm
        os.environ.update(extra)

        from gpr_tpu.ops.blocked import cholesky_blocked

        def chain(r):
            @jax.jit
            def f(a):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = cholesky_blocked(a + out * 1e-30)
                    out = jnp.sum(L[-1])
                return out

            return f

        R = int(os.environ.get("BENCH_REPEATS", 3))
        f1, fR = chain(1), chain(R)
        t0 = time.perf_counter()
        v1 = float(f1(A))
        print(f"{name}: compile r=1 {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        t0 = time.perf_counter()
        float(fR(A))
        print(f"{name}: compile r={R} {time.perf_counter()-t0:.0f}s", file=sys.stderr)

        def best(f, iters=3):
            b = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                float(f(A))
                b = min(b, time.perf_counter() - t0)
            return b

        per = max((best(fR) - best(f1)) / (R - 1), 1e-9)
        results[name] = round(per * 1e3, 2)
        checks[name] = v1
        print(json.dumps({"variant": name, "ms": results[name], "check": v1}))

    base = checks.get(names[0])
    rel = {
        k: (abs(v - base) / max(abs(base), 1e-30) if base is not None else None)
        for k, v in checks.items()
    }
    print(json.dumps({"summary_ms": results, "check_rel_to_first": rel}))


if __name__ == "__main__":
    main()
