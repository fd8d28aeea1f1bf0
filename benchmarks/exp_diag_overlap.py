"""Round-5 headline probes at n=16k: (a) the diag-ablation opportunity —
what the kernel costs with the serial diagonal factor skipped (the ceiling
any diag-hiding scheme could reach); (b) alternative configs never
measured at the shipping (block=128, sw=32, stat, c1g1) point.

    python benchmarks/exp_diag_overlap.py [variant ...]
variants: base, nodiag, nosolve, sw64, sw16, head, rv, panel256
"""

from __future__ import annotations

import json
import os
import sys

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

    VARIANTS = {
        "base": {},
        "nodiag": {"ablate": "diag"},
        "nosolve": {"ablate": "solve"},
        "sw64": {"sw": 64},
        "sw16": {"sw": 16},
        "head": {"diag_scheme": "head"},
        "rv": {"diag_scheme": "rv"},
        "panel256": {"panel": 256},
        "stat2": {"diag_scheme": "stat2"},
        "stat2sw64": {"diag_scheme": "stat2", "sw": 64},
        "stat2p": {"diag_scheme": "stat2p"},
        "withw": {"return_winv": True},
    }
    names = sys.argv[1:] or list(VARIANTS)

    def slope(mk, *args, reps=6, iters=3):
        import time

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
    for name in names:
        kw = VARIANTS[name]

        def mk(r, kw=kw):
            @jax.jit
            def f(X):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L = gram_cholesky_fused(
                        X + out * 1e-30, 8.0, 1.0, 1.0, 0.01,
                        form="gaussian", interpret=interp, **kw,
                    )
                    if isinstance(L, tuple):  # return_winv variants
                        L, W = L
                        out = jnp.sum(L[-1]) + W[0, 0, 0] * 1e-30
                    else:
                        out = jnp.sum(L[-1])
                return out

            return f

        try:
            ms = round(slope(mk, X) * 1e3, 2)
        except Exception as e:
            ms = None
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        res[name] = ms
        print(json.dumps({"variant": name, "ms": ms}))
    print(json.dumps({"n": n, "variants": res}))


if __name__ == "__main__":
    main()
