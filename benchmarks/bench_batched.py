"""Batched many-GP fleet throughput (1 chip): fits/s for B small GPs.

The MXU-friendly regime (SURVEY.md §7): batched Gram + batched Cholesky.
    python benchmarks/bench_batched.py [B] [n]
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

    import gpr_tpu
    from gpr_tpu.gp import batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d, q = 8, 4
    # BENCH_CROUT=0/1 forces the fleet factorizer; unset = auto-dispatch
    crout_env = os.environ.get("BENCH_CROUT")
    use_crout = None if crout_env is None else bool(int(crout_env))

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((B, n, q)).astype(np.float32))
    kernel = gpr_tpu.Gaussian(jnp.float32(2.0), jnp.float32(1.0))

    def make(R):
        @jax.jit
        def f(X, Y):
            out = jnp.asarray(0.0, jnp.float32)
            for _ in range(R):
                fleet = batched.fit_batched(
                    kernel, X + out * 1e-30, Y, sigma=0.1, use_crout=use_crout
                )
                out = jnp.sum(fleet.alpha[:, -1])
            return out

        return f

    f1, f4 = make(1), make(4)
    float(f1(X, Y)); float(f4(X, Y))

    def best(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(X, Y))
            b = min(b, time.perf_counter() - t0)
        return b

    per = (best(f4) - best(f1)) / 3.0
    flops = B * (2 * n * n * d + n**3 / 3 + 2 * n * n * q)
    print(
        json.dumps(
            {
                "metric": f"batched_gp_fits_per_sec_B{B}_n{n}",
                "value": round(B / per, 1),
                "unit": "fits/s",
                "detail": {
                    "backend": jax.default_backend(),
                    "crout": crout_env or "auto",
                    "tflops": round(flops / per / 1e12, 2),
                    "seconds_per_batch": round(per, 5),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
