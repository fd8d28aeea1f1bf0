"""Round-3 fleet factorizer A/B: pallas Crout sweep vs XLA batched
diagonal-block custom calls inside the panel-stepped fleet fit.

Trace anatomy (benchmarks/profile_fit.py BENCH_TARGET=fleet): at B=128,
n=512 the 4 crout_chol_wi calls are 13.8 of the 16.4 ms batch — the
masked full-tile rank-1 sweep costs ~10 full-tile VPU passes per column.
The 'xla' variant replaces each panel step's diagonal factor+inverse with
XLA's batched potrf + batched triangular-solve-vs-I (InvertDiagBlocks
custom calls, one pass each).

    python benchmarks/exp_fleet_r3.py
"""

from __future__ import annotations

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

    import gpr_tpu
    from gpr_tpu.gp import batched

    B = int(os.environ.get("BENCH_B", 128))
    n = int(os.environ.get("BENCH_FLEET_N", 512))
    d, q = 8, 4
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((B, n, q)).astype(np.float32))
    kernel = gpr_tpu.Gaussian(jnp.float32(2.0), jnp.float32(1.0))

    variants = [
        ("crout_p128", {"GPR_FLEET_DIAG": "crout"}, True),
        ("xla_p128", {"GPR_FLEET_DIAG": "xla"}, True),
        ("xla_p256", {"GPR_FLEET_DIAG": "xla", "GPR_FLEET_PANEL": "256"}, True),
        ("xla_p64", {"GPR_FLEET_DIAG": "xla", "GPR_FLEET_PANEL": "64"}, True),
        ("xla_p32", {"GPR_FLEET_DIAG": "xla", "GPR_FLEET_PANEL": "32"}, True),
        ("cxw_p64", {"GPR_FLEET_DIAG": "crout_xlaw", "GPR_FLEET_PANEL": "64"}, True),
        ("cxw_p128", {"GPR_FLEET_DIAG": "crout_xlaw", "GPR_FLEET_PANEL": "128"}, True),
        ("potrf", {}, False),
    ]
    sel = set(sys.argv[1:])
    results = {}
    for name, env, crout in variants:
        if sel and name not in sel:
            continue
        for k in ("GPR_FLEET_DIAG", "GPR_FLEET_PANEL"):
            os.environ.pop(k, None)
        os.environ.update(env)
        panel = int(env.get("GPR_FLEET_PANEL", 128))

        def make(R):
            @jax.jit
            def f(X, Y):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(R):
                    fleet = batched.fit_batched(
                        kernel, X + out * 1e-30, Y, sigma=0.1,
                        use_crout=crout,
                    )
                    out = jnp.sum(fleet.alpha[:, -1])
                return out

            return f

        f1, f4 = make(1), make(4)
        t0 = time.perf_counter()
        float(f1(X, Y)); float(f4(X, Y))
        print(f"{name}: compiles {time.perf_counter()-t0:.0f}s", file=sys.stderr)

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(X, Y))
                b = min(b, time.perf_counter() - t0)
            return b

        per = max((best(f4) - best(f1)) / 3.0, 1e-9)
        results[name] = {
            "ms_per_batch": round(per * 1e3, 3),
            "fits_per_sec": round(B / per, 1),
        }
        print(json.dumps({"variant": name, **results[name]}))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
