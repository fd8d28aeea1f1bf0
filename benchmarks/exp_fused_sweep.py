"""(chunk, group) sweep of the fused gram+Cholesky kernel at headline
scale — the round-4 search for the last ~10% to vs_baseline 1.0
(VERDICT r3 #3: "group>1 r_buf amortization, chunk-height sweep").

Each config is one compile + slope timing of `gram_cholesky_fused`
(n=16k gaussian form, the exact headline program minus the alpha solve).

    python benchmarks/exp_fused_sweep.py                 # default grid
    BENCH_N=8192 python benchmarks/exp_fused_sweep.py 2,1 4,2
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

    from gpr_tpu.ops.pallas_fullchol import gram_cholesky_fused
    from gpr_tpu.utils import config as cfg

    cfg.set_matmul_precision("high")
    n = int(os.environ.get("BENCH_N", 16384))
    d = 128
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    interp = jax.default_backend() != "tpu"

    grid = sys.argv[1:] or ["2,1", "4,1", "8,1", "2,2", "2,4", "4,2"]
    pairs = [tuple(int(v) for v in g.split(",")) for g in grid]

    def slope(mk, *args, reps=6, iters=3):
        f1, fR = mk(1), mk(reps)
        float(f1(*args)); float(fR(*args))

        def best(f):
            b = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                float(f(*args))
                b = min(b, time.perf_counter() - t0)
            return b

        return max((best(fR) - best(f1)) / (reps - 1), 1e-9)

    res = {}
    for chunk, group in pairs:
        def mk(r, chunk=chunk, group=group):
            @jax.jit
            def f(X):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = gram_cholesky_fused(
                        X + out * 1e-30, 8.0, 1.0, 1.0, 0.01,
                        form="gaussian", chunk=chunk, group=group,
                        interpret=interp,
                    )
                    out = jnp.sum(L[-1])
                return out

            return f

        try:
            ms = round(slope(mk, X) * 1e3, 2)
        except Exception as e:  # a bad config must not kill the sweep
            ms = None
            print(f"chunk={chunk} group={group}: FAILED {type(e).__name__}",
                  file=sys.stderr)
        res[f"c{chunk}g{group}"] = ms
        print(json.dumps({"chunk": chunk, "group": group, "ms": ms}))
    print(json.dumps({"n": n, "sweep": res}))


if __name__ == "__main__":
    main()
