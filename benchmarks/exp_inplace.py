"""In-place wide-panel Cholesky vs the recursive blocked schedule (on-chip).

    python benchmarks/exp_inplace.py [n]

Prints per-variant slope-timed seconds at n (default 8192), using the
chained-R protocol from bench.py (the axon tunnel's ~25 ms round trip
cancels in the slope).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/gpr_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    from gpr_tpu.ops import blocked, inplace_chol

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    G = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(G @ G.T + n * np.eye(n, dtype=np.float32))

    def time_variant(name, fn, repeats=3):
        def make(R):
            @jax.jit
            def f(A):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(R):
                    L = fn(A + out * 1e-30)
                    out = out + jnp.sum(L[-1])
                return out

            return f

        f1, fR = make(1), make(repeats)
        t0 = time.perf_counter()
        float(f1(A))
        print(f"{name}: compiled+ran r1 in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        float(fR(A))

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(A))
                b = min(b, time.perf_counter() - t0)
            return b

        per = (best(fR) - best(f1)) / (repeats - 1)
        tf = (n**3 / 3) / per / 1e12
        print(json.dumps({"variant": name, "n": n,
                          "seconds": round(per, 5),
                          "tflops": round(tf, 2)}))

    time_variant("blocked_recursive", lambda A: blocked.cholesky_blocked(A))
    time_variant("inplace_w512", lambda A: inplace_chol.cholesky_inplace(A))
    time_variant(
        "inplace_w1024",
        lambda A: inplace_chol.cholesky_inplace(A, w=1024),
    )


if __name__ == "__main__":
    main()
