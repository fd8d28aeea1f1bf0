"""Experiment: TRSM-via-TRTRI leaf solves + transpose-free right-side
column solves in the blocked Cholesky (round-2 perf chase; BENCHMARKS.md)."""
import json, os, sys, time
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

    n = int(os.environ.get("BENCH_N", 16384))
    variant = os.environ.get("BENCH_VARIANT", "trtri")
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 256)).astype(np.float32)
    A = jnp.asarray(B) @ jnp.asarray(B.T) * (1.0 / 256) + 4.0 * jnp.eye(n, dtype=jnp.float32)

    def make(repeats):
        @jax.jit
        def f(A):
            out = jnp.asarray(0.0, jnp.float32)
            for _ in range(repeats):
                L = cholesky_blocked(A + out * 1e-30, leaf_inverse=(variant == "trtri"))
                out = jnp.sum(L[-1])
            return out
        return f

    R = int(os.environ.get("BENCH_REPEATS", 3))
    f1, fR = make(1), make(R)
    t0 = time.perf_counter(); v1 = float(f1(A))
    print(f"compile+run r=1: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter(); float(fR(A))
    print(f"compile+run r={R}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    best1 = bestR = float("inf")
    for _ in range(3):
        s = time.perf_counter(); float(f1(A)); best1 = min(best1, time.perf_counter() - s)
        s = time.perf_counter(); float(fR(A)); bestR = min(bestR, time.perf_counter() - s)
    ms = (bestR - best1) / (R - 1) * 1e3
    # accuracy spot check at a smaller size
    ns = 2048
    Bs = rng.standard_normal((ns, 256)).astype(np.float32)
    As = jnp.asarray(Bs) @ jnp.asarray(Bs.T) * (1.0 / 256) + 4.0 * jnp.eye(ns, dtype=jnp.float32)
    Ls = np.asarray(cholesky_blocked(As, leaf_inverse=(variant == "trtri")))
    Lref = np.linalg.cholesky(np.asarray(As, np.float64))
    err = float(np.max(np.abs(np.tril(Ls) - Lref)) / np.max(np.abs(Lref)))
    print(json.dumps({"variant": variant, "n": n, "ms": round(ms, 2), "relerr_2048": err}))

if __name__ == "__main__":
    main()
