"""Headline benchmark: exact-GP fit (Gram + Cholesky + solve) throughput.

Measures the reference's learning hot path (reference
lib/GaussianProcess.cpp:641-672: O(n^2 d) Gram build + O(n^3) factorization)
at the BASELINE.json north-star size n=16k on one chip, and reports achieved
TFLOP/s.  ``vs_baseline`` is achieved utilization of the chip's *measured*
matmul speed-of-light divided by the 0.70 north-star target — >= 1.0 means
the "Gram+Cholesky >= 70% MXU" goal is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _time_scalar_fn(make_fn, *args, repeats=8, iters=3):
    """Per-execution wall-clock of a scalar-returning op.

    The remote-TPU (axon) tunnel adds a ~25 ms host round-trip per fetched
    value and ``block_until_ready`` does not synchronize, so a single
    invocation cannot be timed.  ``make_fn(r)`` must return a jitted
    function that chains the op ``r`` times with a data dependence between
    iterations (so XLA cannot CSE them); the per-op time is the slope
    between r=1 and r=repeats, which cancels the fixed round-trip."""
    import jax

    f1 = make_fn(1)
    fR = make_fn(repeats)
    float(f1(*args))  # compile + warm
    float(fR(*args))

    def best_of(f):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(f1)
    tR = best_of(fR)
    return max((tR - t1) / (repeats - 1), 1e-9)


def _probe_fused_schedule(n: int) -> bool:
    """Run the PUBLIC fit route once in a SUBPROCESS, AT THE HEADLINE
    SHAPE, before betting the headline on it.

    A Mosaic lowering bug aborts the whole process (SIGABRT — round 3's
    BENCH_r03 recorded rc=1 and no number at all), so the probe must be
    isolated.  It reuses chip_smoke's ``public_fit_default`` probe, which
    exercises exactly the specialization the bench runs (exact.fit →
    safe_gram_cholesky_fused(return_winv=True) → the with_w=True kernel
    variant + cho_solve_panels), and probes at n = BENCH_N: Mosaic
    lowering failures are shape-dependent (different nc grid / trace
    specialization), so a small-n pass would not guard the real bench
    (ADVICE round 4).  GPR_BENCH_PROBE_N overrides.  On failure the bench
    falls back to the recursive schedule: the headline degrades instead
    of vanishing."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks")
    )
    import chip_smoke

    probe_n = int(os.environ.get("GPR_BENCH_PROBE_N", n))
    return chip_smoke.run_probe(
        "public_fit_default", extra_env={"GPR_SMOKE_FIT_N": str(probe_n)}
    )["ok"]


def main():
    import jax

    # persistent compilation cache: the n=16k programs take minutes to
    # compile over the remote tunnel; cache them across driver runs
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/gpr_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (AttributeError, ValueError):
        pass  # older jax without the knob

    import jax.numpy as jnp

    from gpr_tpu.gp import exact
    from gpr_tpu.kernels import kernels as kermod
    from gpr_tpu.ops import linalg
    import gpr_tpu

    import sys

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    n = int(os.environ.get("BENCH_N", 16384 if on_accel else 2048))

    # Probe the default fused schedule in a subprocess before betting the
    # round's number on it (a lowering abort is a SIGABRT and cannot be
    # caught in-process).  Fallback: the recursive blocked schedule.
    schedule = os.environ.get("GPR_CHOL_SCHEDULE", "fused")
    if on_accel and schedule == "fused":
        if not _probe_fused_schedule(n):
            print(
                "bench: fused-schedule probe FAILED — falling back to "
                "GPR_CHOL_SCHEDULE=recursive",
                file=sys.stderr,
            )
            schedule = "recursive"
            os.environ["GPR_CHOL_SCHEDULE"] = "recursive"
            os.environ["GPR_FIT_SCHEDULE"] = "twopass"
    print(f"bench: backend={backend} n={n} schedule={schedule}", file=sys.stderr)
    d, q = 128, 8
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), dtype)
    Y = jnp.asarray(rng.standard_normal((n, q)), dtype)
    kernel = gpr_tpu.Gaussian(jnp.asarray(8.0, dtype), jnp.asarray(1.0, dtype))
    sigma = jnp.asarray(0.1, dtype)

    def make_fit(repeats):
        # times the PUBLIC training API (gpr_tpu.fit == gp.exact.fit):
        # gram -> safe_cholesky (jitter-guarded) -> regression solve.
        @jax.jit
        def fit_step(X, Y, sigma):
            out = jnp.asarray(0.0, dtype)
            for _ in range(repeats):
                # data dependence on `out` stops CSE across repetitions
                Xr = X + out * 1e-30
                gp = exact.fit(
                    kernel, Xr, Y, sigma=sigma, use_pallas_gram=on_accel
                )
                out = jnp.sum(gp.L[-1]) + jnp.sum(gp.alpha[-1])
            return out

        return fit_step

    t_start = time.perf_counter()
    # repeats=3 is the cross-round protocol (r2..r5 numbers are all on
    # it).  A repeats=6 chain measured SLOWER per-fit (31.1 ms vs
    # 28.5-30.0; ~180 ms of sustained near-peak MXU per call — consistent
    # with duty-cycle downclocking), so a longer chain is not a variance
    # fix here; iters=4 takes one more best-of sample instead.
    t_fit = _time_scalar_fn(make_fit, X, Y, sigma, repeats=3, iters=4)

    # FLOP model: Gram GEMM 2n^2 d, Cholesky n^3/3, two triangular solves 2n^2 q
    flops = 2.0 * n * n * d + n**3 / 3.0 + 2.0 * n * n * q
    tflops = flops / t_fit / 1e12

    # measured matmul speed-of-light on this chip (same dtype, MXU-shaped)
    m = 4096 if on_accel else 1024
    A = jnp.asarray(rng.standard_normal((m, m)), dtype)
    B = jnp.asarray(rng.standard_normal((m, m)), dtype)

    from gpr_tpu.utils.config import matmul_precision

    def make_mm(repeats):
        # peak measured at the SAME precision tier as the workload so the
        # utilization ratio is meaningful
        @jax.jit
        def mm(a, b):
            out = jnp.asarray(0.0, dtype)
            for _ in range(repeats):
                c = jnp.matmul(a + out * 1e-30, b, precision=matmul_precision())
                out = jnp.sum(c, axis=(0, 1)) * 1e-20 + out
            return out

        return mm

    # measured on this chip at the 'high' tier (BENCHMARKS.md); used when
    # the peak re-measurement would blow the driver's time budget
    PEAK_FALLBACK_TFLOPS = 63.0
    elapsed = time.perf_counter() - t_start
    if elapsed > float(os.environ.get("BENCH_TIME_BUDGET", 420)):
        print(
            f"bench: skipping peak re-measurement ({elapsed:.0f}s elapsed); "
            f"using recorded {PEAK_FALLBACK_TFLOPS} TF/s",
            file=sys.stderr,
        )
        peak_tflops = PEAK_FALLBACK_TFLOPS if on_accel else 1e12
    else:
        # the m=4096 matmul is ~2 ms; at repeats=6 the slope is dominated
        # by ~25 ms tunnel round-trip noise (measured peaks swung 62-80
        # TF/s run-to-run).  A 24-deep chain (~48 ms of compute) with
        # best-of-5 brings the swing under ~5%.
        t_mm = _time_scalar_fn(make_mm, A, B, repeats=24, iters=5)
        peak_tflops = 2.0 * m**3 / t_mm / 1e12

    utilization = tflops / peak_tflops
    vs_baseline = utilization / 0.70  # north-star: >=70% of matmul peak

    print(
        json.dumps(
            {
                "metric": f"gp_fit_gram_cholesky_n{n}",
                "value": round(tflops, 3),
                "unit": "TFLOP/s",
                "vs_baseline": round(vs_baseline, 4),
                "detail": {
                    "backend": backend,
                    "n": n,
                    "d": d,
                    "fit_seconds": round(t_fit, 5),
                    "matmul_peak_tflops": round(peak_tflops, 2),
                    "mxu_utilization": round(utilization, 4),
                    "schedule": schedule,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
