"""Experiment: vmapped-blocked vs stock batched Cholesky for fleet mode.

VERDICT r1 item 4: fleet fits at B=128, n=512 ran at 0.31 TF/s through
XLA's stock batched Cholesky — latency-bound panels.  vmapping the
recursive blocked factorization (ops/blocked.py) turns the trailing
updates into (B, m, k) batched GEMMs that keep the MXU busy.

    python benchmarks/exp_batched_blocked.py [B] [n]
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

    from gpr_tpu.ops.blocked import cholesky_blocked

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    Xm = rng.standard_normal((B, n, n)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", Xm, Xm) / n + 4.0 * np.eye(n, dtype=np.float32)
    A = jnp.asarray(A)

    def timed(make, tag):
        def chain(R):
            @jax.jit
            def f(a):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(R):
                    L = make(a + out * 1e-30)
                    out = jnp.sum(L[:, -1, -1])
                return out

            return f

        f1, f4 = chain(1), chain(4)
        float(f1(A)); float(f4(A))

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(A))
                b = min(b, time.perf_counter() - t0)
            return b

        per = max((best(f4) - best(f1)) / 3.0, 1e-9)
        tf = B * (n**3 / 3) / per / 1e12
        print(json.dumps({"variant": tag, "ms": round(per * 1e3, 3),
                          "tflops": round(tf, 3)}))
        return per

    timed(lambda a: jnp.linalg.cholesky(a), "stock_batched")
    for leaf in (64, 128, 256):
        timed(
            lambda a, l=leaf: jax.vmap(
                lambda m: cholesky_blocked(m, leaf=l)
            )(a),
            f"vmapped_blocked_leaf{leaf}",
        )
    for leaf in (128, 256):
        timed(
            lambda a, l=leaf: jax.vmap(
                lambda m: cholesky_blocked(m, leaf=l, gemm_dtype=jnp.bfloat16)
            )(a),
            f"vmapped_blocked_bf16_leaf{leaf}",
        )


if __name__ == "__main__":
    main()
