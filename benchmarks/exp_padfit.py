"""A/B: the padded fused fit path at NON-ALIGNED n vs the blocked
(two-pass) fallback — VERDICT round-4 item 1: the reference's own scales
(n=2500, perf test tests/GaussianProcessTest.cpp:127-154; n=3773, the
breathing fixture / serve path) must ride the flagship kernel.

Variants, each the full fit hot path (gram + factor + regression solve,
q=8):
  fused-256   pad-masked gram_cholesky_fused, panel=256
  fused-512   pad-masked gram_cholesky_fused, panel=512
  twopass     tril gram_pallas -> safe_cholesky (recursive blocked) ->
              cho_solve   (the pre-round-5 dispatch for these n)

Reported TF/s uses the TRUE-n flop count (pad flops are overhead, not
work).  Chained-R slope timing (see bench.py::_time_scalar_fn).

    BENCH_N=2500 python benchmarks/exp_padfit.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _time_scalar_fn  # noqa: E402


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

    from gpr_tpu.ops import linalg, pallas_fullchol, pallas_gram

    n = int(os.environ.get("BENCH_N", 2500))
    d, q = 128, 8
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, q)), jnp.float32)
    sg, sc, noise = 8.0, 1.0, 0.01
    interp = jax.default_backend() != "tpu"

    def fused_fit(panel):
        n_pad = -(-n // panel) * panel

        def one(Xr, Yr):
            L, W, _ = pallas_fullchol.safe_gram_cholesky_fused(
                Xr, sg, sc, 1.0, noise, form="gaussian", panel=panel,
                interpret=interp, return_winv=True,
            )
            Yp = Yr
            if n_pad != n:
                Yp = jnp.concatenate(
                    [Yr, jnp.zeros((n_pad - n, q), jnp.float32)], axis=0
                )
            alpha = pallas_fullchol.cho_solve_panels(L, W, Yp)[:n]
            return L[:n, :n], alpha

        return one

    def twopass(Xr, Yr):
        # tril only when the blocked factorization (potrf('L') contract)
        # will consume it — a small-n XLA-potrf dispatch reads the FULL
        # matrix and a tril gram would feed it garbage uppers
        tril = n >= linalg._BLOCKED_MIN_N
        K = pallas_gram.gram_pallas(
            Xr, Xr, sg, sc, 1.0, diag=noise, form="gaussian",
            interpret=interp, tril=tril,
        )
        L, _ = linalg.safe_cholesky(K)
        return L, linalg.cho_solve(L, Yr)

    variants = {
        "fused-256": fused_fit(256),
        "fused-512": fused_fit(512),
        "twopass": twopass,
    }
    names = sys.argv[1:] or list(variants)

    # accuracy cross-check vs float64 (one fetch)
    X64 = np.asarray(X, np.float64)
    sq = ((X64[:, None, :] - X64[None, :, :]) ** 2).sum(-1)
    K64 = sc * sc * np.exp(-0.5 * sq / (sg * sg)) + noise * np.eye(n)
    ref = np.linalg.solve(K64, np.asarray(Y, np.float64))

    flops = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n * q
    out = {"n": n, "d": d, "q": q, "variants": {}}
    for name in names:
        f = variants[name]
        alpha = np.asarray(jax.jit(f)(X, Y)[1])
        err = np.abs(alpha - ref).max() / np.abs(ref).max()

        def make(repeats, f=f):
            @jax.jit
            def step(Xa, Ya):
                acc = jnp.float32(0.0)
                for _ in range(repeats):
                    L, a = f(Xa + acc * 1e-30, Ya)
                    acc = jnp.sum(L[-1]) + jnp.sum(a[-1])
                return acc

            return step

        t = _time_scalar_fn(make, X, Y, repeats=8)
        out["variants"][name] = {
            "ms": round(t * 1e3, 3),
            "tflops_true_n": round(flops / t / 1e12, 2),
            "alpha_rel_err": float(f"{err:.2e}"),
        }
        print(f"{name}: {t*1e3:.3f} ms  {flops/t/1e12:.2f} TF/s "
              f"(true-n)  err {err:.2e}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
