"""A/B: single-dispatch fused left-looking Cholesky vs the recursive
blocked schedule (the round-2 dispatch default).

Chained-R slope timing (the tunnel's ~25 ms host fetch dominates single
executions — see bench.py).  Accuracy cross-checked against the blocked
factor via max |L_f - L_b| / max |L_b|.

    BENCH_N=8192 python benchmarks/exp_fused.py
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

    from gpr_tpu.ops.blocked import cholesky_blocked
    from gpr_tpu.ops.pallas_fullchol import cholesky_fused

    n = int(os.environ.get("BENCH_N", 8192))
    panel = int(os.environ.get("GPR_FUSED_PANEL", 512))
    chunk = int(os.environ.get("GPR_FUSED_CHUNK", 4))
    rng = np.random.default_rng(0)
    Xm = rng.standard_normal((n, 256)).astype(np.float32)
    A = jnp.asarray(Xm) @ jnp.asarray(Xm.T) * (1.0 / 256) + 4.0 * jnp.eye(
        n, dtype=jnp.float32
    )
    A = jax.device_put(A)

    interp = jax.default_backend() != "tpu"

    ablate = os.environ.get("GPR_FUSED_ABLATE", "")

    def fused(a):
        return cholesky_fused(
            a, panel=panel, chunk=chunk, interpret=interp, ablate=ablate
        )

    variants = {"blocked": cholesky_blocked, "fused": fused}
    names = sys.argv[1:] or list(variants)

    # accuracy cross-check (one fetch each)
    Lb = variants["blocked"](A)
    Lf = variants["fused"](A)
    scale = float(jnp.max(jnp.abs(jnp.tril(Lb))))
    rel = float(jnp.max(jnp.abs(jnp.tril(Lf) - jnp.tril(Lb)))) / scale
    print(json.dumps({"check_rel_fused_vs_blocked": rel, "n": n, "panel": panel, "chunk": chunk}))

    flops = n**3 / 3
    results = {}
    for name in names:
        fn = variants[name]

        def chain(r):
            @jax.jit
            def f(a):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = fn(a + out * 1e-30)
                    out = jnp.sum(L[-1])
                return out

            return f

        R = int(os.environ.get("BENCH_REPEATS", 3))
        f1, fR = chain(1), chain(R)
        t0 = time.perf_counter()
        float(f1(A))
        print(f"{name}: compile r=1 {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        t0 = time.perf_counter()
        float(fR(A))
        print(f"{name}: compile r={R} {time.perf_counter()-t0:.0f}s", file=sys.stderr)

        def best(f, iters=4):
            b = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                float(f(A))
                b = min(b, time.perf_counter() - t0)
            return b

        per = max((best(fR) - best(f1)) / (R - 1), 1e-9)
        results[name] = {
            "ms": round(per * 1e3, 2),
            "tflops": round(flops / per / 1e12, 2),
        }
        print(json.dumps({"variant": name, **results[name]}))

    print(json.dumps({"n": n, "panel": panel, "summary": results}))


if __name__ == "__main__":
    main()
