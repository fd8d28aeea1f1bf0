"""Narrow-rhs solve A/B: recursive blocked substitution vs the streaming
pallas kernel (ops/pallas_solve.py) at the headline size n=16k, q=8.

    python benchmarks/exp_solve.py [n] [q]

The blocked solve measured 8.4-10.9 ms at n=16k q=8 on v5e — pure latency
(~100 sequential leaf custom-calls / narrow GEMMs); the streaming kernel's
floor is one HBM read of tril(L) (~0.7 ms at n=16k f32).  Prints one JSON
line per variant using the chained-R slope protocol (bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    import jax.numpy as jnp
    import numpy as np

    from gpr_tpu.ops.blocked import cho_solve_blocked
    from gpr_tpu.ops.pallas_solve import cho_solve_narrow

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    G = rng.standard_normal((n, 256)).astype(np.float32)
    A = jnp.asarray(G) @ jnp.asarray(G.T) * (1.0 / 256) + 4.0 * jnp.eye(
        n, dtype=jnp.float32
    )
    L = jnp.linalg.cholesky(A)
    B = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)

    # f64 reference at a spot-checkable size
    ns = 2048
    Ls = np.asarray(L[:ns, :ns], np.float64)
    Bs = np.asarray(B[:ns], np.float64)
    ref = np.linalg.solve(Ls @ Ls.T, Bs)

    def time_variant(name, fn, repeats=4):
        def make(R):
            @jax.jit
            def f(L, B):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(R):
                    x = fn(L, B + out * 1e-30)
                    out = out + jnp.sum(x[-1])
                return out

            return f

        f1, fR = make(1), make(repeats)
        t0 = time.perf_counter()
        float(f1(L, B))
        print(f"{name}: compiled+ran r1 in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        float(fR(L, B))

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(L, B))
                b = min(b, time.perf_counter() - t0)
            return b

        per = (best(fR) - best(f1)) / (repeats - 1)
        xs = np.asarray(fn(jnp.asarray(Ls, jnp.float32),
                           jnp.asarray(Bs, jnp.float32)), np.float64)
        err = float(np.linalg.norm(xs - ref) / np.linalg.norm(ref))
        print(json.dumps({"variant": name, "n": n, "q": q,
                          "ms": round(per * 1e3, 3),
                          "relerr_2048": err}))

    time_variant("blocked", cho_solve_blocked)
    time_variant("narrow_bs512", cho_solve_narrow)

    def narrow_bs1024(L, B):
        return cho_solve_narrow(L, B, bs=1024)

    time_variant("narrow_bs1024", narrow_bs1024)

    def narrow_bs512_pallasinv(L, B):
        return cho_solve_narrow(L, B, bs=512, diag_inv="pallas")

    time_variant("narrow_bs512_pallasinv", narrow_bs512_pallasinv)

    def narrow_bs1024_pallasinv(L, B):
        return cho_solve_narrow(L, B, bs=1024, diag_inv="pallas")

    time_variant("narrow_bs1024_pallasinv", narrow_bs1024_pallasinv)


if __name__ == "__main__":
    main()
