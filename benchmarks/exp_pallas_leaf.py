"""Experiment: pallas whole-leaf Cholesky vs XLA's lax.linalg.cholesky at
recursion-leaf sizes (round-2 perf chase; see BENCHMARKS.md)."""
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
    from gpr_tpu.ops.pallas_leaf import leaf_cholesky

    n = int(os.environ.get("BENCH_N", 1024))
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 300)).astype(np.float32)
    A = jnp.asarray(B @ B.T / 300 + 2.0 * np.eye(n, dtype=np.float32))

    def make(variant, repeats):
        @jax.jit
        def f(A):
            out = jnp.asarray(0.0, jnp.float32)
            for _ in range(repeats):
                Ar = A + out * 1e-30
                if variant == "pallas":
                    L = leaf_cholesky(Ar)
                else:
                    L = jax.lax.linalg.cholesky(Ar, symmetrize_input=False)
                out = jnp.sum(L[-1])
            return out
        return f

    R = int(os.environ.get("BENCH_REPEATS", 16))
    for variant in ("xla", "pallas"):
        f1, fR = make(variant, 1), make(variant, R)
        v1 = float(f1(A)); vR = float(fR(A))
        t1 = min(time.perf_counter() - s for s in [time.perf_counter()] if float(f1(A)) == v1)
        best1 = bestR = float("inf")
        for _ in range(3):
            s = time.perf_counter(); float(f1(A)); best1 = min(best1, time.perf_counter() - s)
            s = time.perf_counter(); float(fR(A)); bestR = min(bestR, time.perf_counter() - s)
        us = (bestR - best1) / (R - 1) * 1e6
        print(json.dumps({"variant": variant, "n": n, "us_per_leaf": round(us, 1)}))

if __name__ == "__main__":
    main()
