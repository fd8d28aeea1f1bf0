"""Experiment: eliminating the lax.cond buffer-copy overhead in
safe_cholesky (measured: bare 43.4 ms, safe 50.3 ms at n=16k — the
custom_vjp wrapper is free, so ~6.6 ms is the cond boundary).

Variants:
  current   safe_cholesky as shipped
  operand   cond(ok0, identity, escalate, L0) — threading L0 through the
            operand to let XLA alias the true-branch output to the input
  nocond    L0 returned unconditionally, no retry at all
            (WRONG on failure — skeleton for the copy-free floor)

MEASURED (v5e, n=16k, round-1 cond structure as "current"): current
48.0 ms, operand 47.6 ms, nocond 43.3 ms — XLA does NOT alias through
cond even with operand threading; only removing the matrix-carrying cond
reaches the bare floor.  This motivated the while_loop-carried-factor
rewrite now shipped in ops/linalg.py (the loop's zero-iteration result
aliases the attempt buffer).

    python benchmarks/exp_cond_variants.py [n]
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
    from jax import lax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass

    from gpr_tpu.ops import linalg
    from gpr_tpu.ops.linalg import add_diagonal, chol_lower

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    Xm = rng.standard_normal((n, 256)).astype(np.float32)
    A = Xm @ Xm.T / 256 + 4.0 * np.eye(n, dtype=np.float32)
    A = jnp.asarray(A)

    def safe_operand(A):
        dtype = A.dtype
        eps = jnp.finfo(dtype).eps
        L0 = chol_lower(A)
        ok0 = jnp.all(jnp.isfinite(L0[..., -1, -1]))
        A_ng = lax.stop_gradient(A)

        def _accept(L):
            return L, jnp.zeros((), dtype) + jnp.asarray(ok0, dtype) * 0

        def _escalate(L):
            diag_mean = jnp.mean(jnp.abs(jnp.diagonal(A_ng)))
            base = (eps * jnp.maximum(diag_mean, 1.0)).astype(dtype)

            def cond(state):
                ok, tries, _ = state
                return jnp.logical_and(jnp.logical_not(ok), tries < 6)

            def body(state):
                _, tries, j = state
                jnew = jnp.where(tries == 0, j, j * 10.0)
                ok = jnp.all(
                    jnp.isfinite(chol_lower(add_diagonal(A_ng, jnew))[-1, -1])
                )
                return ok, tries + 1, jnew

            _, _, j = lax.while_loop(
                cond, body, (jnp.logical_and(ok0, False), jnp.array(0), base)
            )
            return chol_lower(add_diagonal(A, j)), j

        return lax.cond(ok0, _accept, _escalate, L0)

    def safe_nocond(A):
        L0 = chol_lower(A)
        ok0 = jnp.all(jnp.isfinite(L0[..., -1, -1]))
        return L0, jnp.asarray(ok0, A.dtype) * 0

    def timed(make, tag, R=4):
        def chain(r):
            @jax.jit
            def f(a):
                out = jnp.asarray(0.0, jnp.float32)
                for _ in range(r):
                    L, j = make(a + out * 1e-30)
                    out = jnp.sum(L[-1]) + j * 0
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
        print(json.dumps({"variant": tag, "ms": round(per * 1e3, 2)}), flush=True)
        return per

    timed(lambda a: linalg.safe_cholesky(a), "current")
    timed(safe_operand, "operand")
    timed(safe_nocond, "nocond")


if __name__ == "__main__":
    main()
