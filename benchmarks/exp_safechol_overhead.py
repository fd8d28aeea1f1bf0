"""Experiment: safe_cholesky's overhead over the bare blocked factorization
(round-2 perf chase; BENCHMARKS.md).

Times, at n=16k f32 on-chip, per execution:
  bare     chol_lower(A)                      (the floor)
  safe     safe_cholesky(A)[0]                (full wrapper)

MEASURED (v5e, n=16k): with the round-1 lax.cond structure — bare 43.4 ms,
custom_vjp wrapper +0.3 ms (free), full safe 50.3 ms: the cond boundary
cost ~6.6 ms (XLA materializes branch outputs into fresh buffers; operand-
threading the factor through the cond recovered only 0.45 ms).  The
while_loop-carried-factor rewrite (ops/linalg.py) removes the cond; this
script verifies safe == bare.

    python benchmarks/exp_safechol_overhead.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    from gpr_tpu.ops import linalg

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    Xm = rng.standard_normal((n, 256)).astype(np.float32)
    A = Xm @ Xm.T / 256 + 4.0 * np.eye(n, dtype=np.float32)
    A = jnp.asarray(A)

    def timed(make, tag, R=4):
        def chain(r):
            @jax.jit
            def f(a):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = make(a + out * 1e-30)
                    out = jnp.sum(L[-1])
                return out

            return f

        f1, fR = chain(1), chain(R)
        float(f1(A)); float(fR(A))

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(A))
                b = min(b, time.perf_counter() - t0)
            return b

        per = max((best(fR) - best(f1)) / (R - 1), 1e-9)
        print(json.dumps({"variant": tag, "ms": round(per * 1e3, 2)}))
        return per

    timed(linalg.chol_lower, "bare")
    timed(lambda a: linalg.safe_cholesky(a)[0], "safe")


if __name__ == "__main__":
    main()
